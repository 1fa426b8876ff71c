package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Pq, SimSearch}
import Tables._

/** Product-quantization queries over the `embeddings` table — the
  * vector-compression leg of the ANN stack (see [[graft.ops.Pq]] for
  * the scale argument: d doubles → M codes per stored vector, ADC
  * scans touch codes only).
  *
  * Oracle determinism follows the vector-family contract
  * ([[VectorOps]]): element-wise cast to double, sequential left-fold
  * distances (`list_reduce` ≡ the codegen kernels' index-ascending
  * loops), 6-dp half-up rounding before any compare or sum, ties to
  * the lower code index / lower corpus id. The registered queries use
  * the id-SEEDED books (LIMIT-derivable in SQL, like q34/q35's seeded
  * coarse codebook) so the replay stays bounded; the Lloyd-refined
  * books are measured in ScaleLaws, mirroring the q127 → q139 split.
  */
object PqOps {

  /** DuckDB sequential-fold squared L2 of list exprs (1-indexed),
    * mirroring [[graft.functions.PqExprs.l2sqEval]]'s fold order. */
  private[queries] def l2Sql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), " +
      "(acc, x) -> acc + x)"

  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(1, len($x) + 1), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE))), " +
        "(acc, x) -> acc + x)"
    s"round(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})), 6)"
  }

  /** CTE block shared by the PQ oracles: seeded per-subspace books
    * (seed/cent), per-(vector, subspace) sub-vectors (sub), the full
    * distance grid rounded per entry (dall — the query rows' ADC
    * tables ARE its slices), and the argmin code assignment (code). */
  private def pqCtes(m: Int, sub: Int, ksub: Int): String =
    s"""seed AS (SELECT vec_id, v,
       |           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
       |         FROM e ORDER BY vec_id LIMIT $ksub),
       |cent AS (SELECT ms.range AS m, j,
       |           list_transform(range(1, ${sub + 1}), i -> CAST(v[ms.range * $sub + i] AS DOUBLE)) AS c
       |         FROM seed, range(0, $m) ms),
       |subv AS (SELECT vec_id, ms.range AS m,
       |           list_transform(range(1, ${sub + 1}), i -> CAST(v[ms.range * $sub + i] AS DOUBLE)) AS sv
       |         FROM e, range(0, $m) ms),
       |dall AS (SELECT s.vec_id, s.m, c.j, round(${l2Sql("s.sv", "c.c")}, 6) AS dist
       |         FROM subv s JOIN cent c ON s.m = c.m),
       |code AS (SELECT vec_id, m, j FROM (
       |           SELECT vec_id, m, j,
       |             row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
       |           FROM dall) WHERE rn = 1)""".stripMargin

  /** Per-(q, c, m) ADC fold + rank, parameterized by the candidate
    * relation `cand(q_id, c_id)`. */
  private def adcRankCtes: String =
    s"""pairm AS (SELECT cand.q_id, cand.c_id, qd.m, qd.dist
       |          FROM cand
       |          JOIN code cd ON cd.vec_id = cand.c_id
       |          JOIN dall qd ON qd.vec_id = cand.q_id
       |           AND qd.m = cd.m AND qd.j = cd.j),
       |score AS (SELECT q_id, c_id,
       |            round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |              list(dist ORDER BY m)), (acc, x) -> acc + x), 6) AS adist
       |          FROM pairm GROUP BY 1, 2),
       |ranked AS (SELECT q_id, c_id, adist,
       |             row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, c_id ASC) AS rn
       |           FROM score)""".stripMargin

  def defs: Map[String, Q] = {
    val m = Pq.M
    val sub = SimSearch.LshDim / Pq.M
    val ksub = Pq.Ksub

    Map(
      // PQ encode + full ADC scan, with per-row hit flags against the
      // metric-matched exact (squared-L2) top-k — one query carries
      // both the compressed-scan result AND its approximation quality,
      // hash-checked end to end (encode, tables, fold, rank, recall
      // join all replayed in SQL).
      "q148_pq_topk" -> Q(
        (s, d) => {
          val emb = embeddings(s, d)
          val books = Pq.seedBooks(emb, "vec_id", "embedding", m, ksub)
          val codes = Pq.encodeCodes(emb, "vec_id", "embedding", books)
          val approx = Pq.adcTopK(
            emb.where(col("vec_id") < 8), codes, "vec_id", "embedding", books, 3)
          val exact = Pq.l2TopK(
              emb.where(col("vec_id") < 8), emb, "vec_id", "embedding", 3)
            .select(col("q_id"), col("c_id"), lit(true).as("hit"))
          approx.join(broadcast(exact), Seq("q_id", "c_id"), "left")
            .select(col("q_id"), col("rn"), col("c_id"), col("adist"),
              coalesce(col("hit"), lit(false)).as("hit"))
        },
        Some(s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
                |${pqCtes(m, sub, ksub)},
                |cand AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id
                |         FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
                |$adcRankCtes,
                |xp AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                |         round(${l2Sql("q.v", "c.v")}, 6) AS dist
                |       FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
                |exact AS (SELECT q_id, c_id FROM (
                |            SELECT q_id, c_id,
                |              row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, c_id ASC) AS rn
                |            FROM xp) WHERE rn <= 3)
                |SELECT r.q_id, r.rn, r.c_id, r.adist,
                |       (x.c_id IS NOT NULL) AS hit
                |FROM ranked r LEFT JOIN exact x
                |  ON r.q_id = x.q_id AND r.c_id = x.c_id
                |WHERE r.rn <= 3""".stripMargin),
        "PQ-compressed ADC top-k (8 subspaces × 16 centroids, 64×-smaller scan) with exact-L2 hit flags"),

      // The two-stage production scan: ADC top-50 prefilter from the
      // compressed codes, exact squared-L2 re-rank of candidates only
      // — full vectors are read for prefilterK·|queries| rows, never
      // the corpus. The oracle replays prefilter, re-rank and the
      // final ranking (both stages' tie disciplines) end to end.
      "q151_pq_rerank" -> Q(
        (s, d) => {
          val emb = embeddings(s, d)
          val books = Pq.seedBooks(emb, "vec_id", "embedding", m, ksub)
          Pq.adcRerankTopK(emb.where(col("vec_id") < 8), emb,
              "vec_id", "embedding", books, prefilterK = 50, topK = 5)
            .select(col("q_id"), col("rn"), col("c_id"), col("dist"))
        },
        Some(s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
                |${pqCtes(m, sub, ksub)},
                |cand AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id
                |         FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
                |$adcRankCtes,
                |pre AS (SELECT q_id, c_id FROM ranked WHERE rn <= 50),
                |rr AS (SELECT p.q_id, p.c_id,
                |         round(${l2Sql("q.v", "c.v")}, 6) AS dist
                |       FROM pre p
                |       JOIN e q ON q.vec_id = p.q_id
                |       JOIN e c ON c.vec_id = p.c_id),
                |rank2 AS (SELECT q_id, c_id, dist,
                |            row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, c_id ASC) AS rn
                |          FROM rr)
                |SELECT q_id, rn, c_id, dist FROM rank2 WHERE rn <= 5""".stripMargin),
        "ADC-prefilter + exact re-rank: the two-stage compressed scan, full-vector IO bounded to candidates"),

      // IVF+PQ: the composed production index — coarse cells bound
      // WHICH codes each query scores (probe equi-join), PQ bounds the
      // per-code cost; nothing in the scoring path touches a full
      // vector. Query sample vec_id % 13 = 0 (the q139 spread sample,
      // disjoint in spirit from both seed sets).
      "q150_pq_ivf_topk" -> Q(
        (s, d) => {
          val emb = embeddings(s, d)
          val books = Pq.seedBooks(emb, "vec_id", "embedding", m, ksub)
          val coarse = SimSearch.collectCodebook(
            SimSearch.ivfCentroids(emb, "vec_id", "embedding"))
          Pq.pqIvfTopK(emb, col("id") % 13 === 0, "vec_id", "embedding",
              topK = 3, nProbe = SimSearch.IvfProbe, coarse, books)
            .select(col("q_id"), col("rn"), col("c_id"), col("adist"))
        },
        Some(s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
                |${pqCtes(m, sub, ksub)},
                |ivfc AS (SELECT vec_id AS cid, v AS cv FROM e
                |         ORDER BY vec_id LIMIT ${SimSearch.IvfK}),
                |rt AS (SELECT e.vec_id, cid,
                |         row_number() OVER (PARTITION BY e.vec_id
                |           ORDER BY ${cosSql("e.v", "cv")} DESC, cid) AS rn
                |       FROM e CROSS JOIN ivfc),
                |cand AS (SELECT p.vec_id AS q_id, cl.vec_id AS c_id
                |         FROM (SELECT vec_id, cid FROM rt
                |               WHERE vec_id % 13 = 0 AND rn <= ${SimSearch.IvfProbe}) p
                |         JOIN (SELECT vec_id, cid FROM rt WHERE rn = 1) cl
                |           ON p.cid = cl.cid
                |         WHERE p.vec_id <> cl.vec_id),
                |$adcRankCtes
                |SELECT q_id, rn, c_id, adist FROM ranked WHERE rn <= 3""".stripMargin),
        "IVF+PQ composed index: coarse-cell probes bound the candidates, ADC codes bound the per-candidate cost"))
  }
}
