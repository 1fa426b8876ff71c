package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Sparse lexical retrieval over the documents table — the query-side
  * face of the text stack (decontamination, dedup triage and eval-set
  * mining all want "which corpus docs score highest for this query").
  *
  * Scorer: BM25's shape with the repo's cross-engine determinism
  * discipline — the log in the idf is replaced by its RATIONAL
  * argument, idf_r = (N − df + 0.5)/(df + 0.5) (monotone in the
  * classic idf, so per-term orderings agree; documented surrogate,
  * exact in IEEE given integer inputs), tf normalization is the
  * standard k1/b form evaluated in a fixed operation order, every
  * per-term factor is 6-dp rounded before the product, and the
  * per-document sum runs over DECIMAL(30,15) (order-independent —
  * 6-dp terms are exact in it), cast back and rounded. Both engines
  * replay the identical IEEE sequence, so the scores hash-match.
  *
  * Scale shape: the scoring join is query-term postings — each query
  * term meets only the documents containing it (equi-join on term),
  * never query × corpus; df/dl/avgdl are one aggregation pass each,
  * and the per-query top-k is a bounded window. At 100 TB the posting
  * join IS the inverted-index plan (bucket the term column for
  * co-located postings). */
object RetrievalOps {

  val K1 = 1.2
  val B = 0.75

  def defs: Map[String, Q] = Map(
    // five queries = the token sets of docs 0–4; rank the whole corpus
    // by the surrogate-BM25 score, top-5 per query (self-matches are
    // legitimate and rank first — retrieval finding the query's own
    // source is the sanity case).
    "q157_bm25_topk" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d)
        val toks = docs.select(col("doc_id"),
            explode(graft.ops.TextAnalysis.tokens(col("text"))).as("t"))
          .localCheckpoint() // read three ways: tf, df, query terms
        val tf = toks.groupBy(col("doc_id"), col("t"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = toks.select(col("doc_id"), col("t")).distinct()
          .groupBy(col("t")).agg(count(lit(1)).as("df"))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
            round(sum(col("dl")).cast("double") / count(lit(1)), 6).as("avgdl"))
        val qterms = toks.where(col("doc_id") < 5)
          .select(col("doc_id").as("q_id"), col("t")).distinct()
        // literal discipline: every float constant is the double nearest
        // its decimal string on BOTH engines (Spark lit(2.2) ≡ DuckDB
        // CAST(2.2 AS DOUBLE)); operation order written identically
        val idf = round((col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)), 6)
        val tfn = round((col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 6)
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("doc_id").asc)
        qterms.join(tf, Seq("t"))
          .join(broadcast(dfreq), Seq("t"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .select(col("q_id"), col("doc_id"),
            round(idf * tfn, 6).as("term_score"))
          .groupBy(col("q_id"), col("doc_id"))
          .agg(round(sum(col("term_score").cast("decimal(30,15)"))
            .cast("double"), 6).as("score"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5)
          .select(col("q_id"), col("rn"), col("doc_id"), col("score"))
      },
      Some {
        val toksSql = TextOps.toksSql
        s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
           |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
           |       FROM tk GROUP BY 1, 2),
           |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df
           |          FROM (SELECT DISTINCT doc_id, t FROM tk) GROUP BY 1),
           |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           |       FROM tk GROUP BY 1),
           |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |            round(CAST(sum(dl) AS DOUBLE) / count(*), 6) AS avgdl
           |          FROM dl),
           |qterms AS (SELECT DISTINCT doc_id AS q_id, t FROM tk WHERE doc_id < 5),
           |scored AS (SELECT q.q_id, tf.doc_id,
           |             round(
           |               round((CAST(s.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
           |                     (CAST(dfreq.df AS DOUBLE) + CAST(0.5 AS DOUBLE)), 6) *
           |               round((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) /
           |                     (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl.dl AS DOUBLE) / s.avgdl)), 6),
           |             6) AS term_score
           |           FROM qterms q
           |           JOIN tf ON tf.t = q.t
           |           JOIN dfreq ON dfreq.t = q.t
           |           JOIN dl ON dl.doc_id = tf.doc_id
           |           CROSS JOIN stats s),
           |agg AS (SELECT q_id, doc_id,
           |          round(CAST(sum(CAST(term_score AS DECIMAL(30,15))) AS DOUBLE), 6) AS score
           |        FROM scored GROUP BY 1, 2),
           |rk AS (SELECT q_id, doc_id, score,
           |         row_number() OVER (PARTITION BY q_id
           |           ORDER BY score DESC, doc_id ASC) AS rn
           |       FROM agg)
           |SELECT q_id, rn, doc_id, score FROM rk WHERE rn <= 5""".stripMargin
      },
      "surrogate-BM25 lexical top-k: query-term posting joins, decimal-summed 6-dp term scores, bounded per-query window"))
}
