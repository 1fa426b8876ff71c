package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Pq, SimSearch, Sq}
import Tables._

/** Scalar-quantization queries over the `embeddings` table — the
  * one-rung-below-PQ compression leg (see [[graft.ops.Sq]] for the
  * scale argument: d bytes per stored vector from one stats pass, no
  * codebook training, asymmetric scans on codes only).
  *
  * Oracle determinism follows the vector-family contract
  * ([[VectorOps]]/[[PqOps]]): element-wise double casts, min/max grid
  * stats (exact — no summation), `round(·, 0)` codes over non-negative
  * arguments (half-up ≡ half-away), sequential left-fold distances,
  * 6-dp rounding before any compare, ties to the lower corpus id. */
object SqOps {

  /** DuckDB sequential-fold dot / cosine ([[VectorOps]]'s discipline,
    * local copy for the coarse-quantizer ranking CTE). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      "(acc, x) -> acc + x)"

  private def cosSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  /** CTE block shared by the SQ oracles: per-dimension grid stats
    * (st → prm as ordered lists) and the corpus code table (cd),
    * replaying [[graft.ops.Sq.dimGrid]] + [[graft.ops.Sq.encode]]. */
  private def sqCtes: String =
    s"""ex AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS pos,
       |         unnest(v) AS x FROM e),
       |st AS (SELECT pos, min(CAST(x AS DOUBLE)) AS mn,
       |         max(CAST(x AS DOUBLE)) AS mx FROM ex GROUP BY 1),
       |prm AS (SELECT list(mn ORDER BY pos) AS mn,
       |          list(CASE WHEN mx > mn THEN CAST(255.0 AS DOUBLE) / (mx - mn)
       |               ELSE CAST(0.0 AS DOUBLE) END ORDER BY pos) AS sc,
       |          list(CASE WHEN mx > mn THEN (mx - mn) / CAST(255.0 AS DOUBLE)
       |               ELSE CAST(0.0 AS DOUBLE) END ORDER BY pos) AS istep
       |        FROM st),
       |cd AS (SELECT vec_id,
       |         list_transform(range(1, len(v) + 1),
       |           i -> CAST(round((CAST(v[i] AS DOUBLE) - mn[i]) * sc[i], 0) AS BIGINT)) AS codes
       |       FROM e CROSS JOIN prm)""".stripMargin

  /** Per-(q, c) asymmetric distance + rank over the code table. */
  private def sqRankCtes(qPred: String): String = {
    val recon = "(mn[i] + CAST(c.codes[i] AS DOUBLE) * istep[i])"
    s"""p AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |          list_transform(range(1, len(q.v) + 1), i ->
       |            (CAST(q.v[i] AS DOUBLE) - $recon) *
       |            (CAST(q.v[i] AS DOUBLE) - $recon))),
       |          (acc, x) -> acc + x), 6) AS sdist
       |      FROM e q JOIN cd c ON $qPred AND q.vec_id <> c.vec_id
       |      CROSS JOIN prm),
       |ranked AS (SELECT q_id, c_id, sdist,
       |             row_number() OVER (PARTITION BY q_id ORDER BY sdist ASC, c_id ASC) AS rn
       |           FROM p)""".stripMargin
  }

  def defs: Map[String, Q] = Map(
    // SQ8 codes-only top-k with per-row hit flags against the
    // metric-matched exact (squared-L2) top-k — the q148 pattern one
    // compression rung down: grid stats, encode, asymmetric fold,
    // rank, and the recall join all replayed in SQL.
    "q160_sq8_topk" -> Q(
      (s, d) => {
        val emb = embeddings(s, d)
        val approx = Sq.sqTopK(emb.where(col("vec_id") < 8), emb,
          "vec_id", "embedding", k = 3)
        val exact = Pq.l2TopK(emb.where(col("vec_id") < 8), emb,
            "vec_id", "embedding", 3)
          .select(col("q_id"), col("c_id"), lit(true).as("hit"))
        approx.join(broadcast(exact), Seq("q_id", "c_id"), "left")
          .select(col("q_id"), col("rn"), col("c_id"), col("sdist"),
            coalesce(col("hit"), lit(false)).as("hit"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
              |$sqCtes,
              |${sqRankCtes("q.vec_id < 8")},
              |xp AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              |         round(${PqOps.l2Sql("q.v", "c.v")}, 6) AS dist
              |       FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
              |exact AS (SELECT q_id, c_id FROM (
              |            SELECT q_id, c_id,
              |              row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, c_id ASC) AS rn
              |            FROM xp) WHERE rn <= 3)
              |SELECT r.q_id, r.rn, r.c_id, r.sdist,
              |       (x.c_id IS NOT NULL) AS hit
              |FROM ranked r LEFT JOIN exact x
              |  ON r.q_id = x.q_id AND r.c_id = x.c_id
              |WHERE r.rn <= 3""".stripMargin),
      "SQ8 asymmetric top-k (per-dim uint8 grid, 8x-smaller scan) with exact-L2 hit flags"),

    // The two-stage scan: SQ prefilter top-50 from codes, exact
    // squared-L2 re-rank of candidates only — q151's discipline on
    // the training-free grid. Both stages' tie rules replayed.
    "q161_sq8_rerank" -> Q(
      (s, d) => {
        val emb = embeddings(s, d)
        Sq.sqRerankTopK(emb.where(col("vec_id") < 8), emb,
            "vec_id", "embedding", prefilterK = 50, topK = 5)
          .select(col("q_id"), col("rn"), col("c_id"), col("dist"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
              |$sqCtes,
              |${sqRankCtes("q.vec_id < 8")},
              |pre AS (SELECT q_id, c_id FROM ranked WHERE rn <= 50),
              |rr AS (SELECT p.q_id, p.c_id,
              |         round(${PqOps.l2Sql("q.v", "c.v")}, 6) AS dist
              |       FROM pre p
              |       JOIN e q ON q.vec_id = p.q_id
              |       JOIN e c ON c.vec_id = p.c_id),
              |rank2 AS (SELECT q_id, c_id, dist,
              |            row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, c_id ASC) AS rn
              |          FROM rr)
              |SELECT q_id, rn, c_id, dist FROM rank2 WHERE rn <= 5""".stripMargin),
      "SQ8-prefilter + exact re-rank: full-vector IO bounded to candidates, no training pass"),

    // IVF+SQ: the composed training-free index (FAISS IVFSQ) — coarse
    // cells bound the candidates on a cell equi-join (q150's plan
    // shape, asserted nested-loop-free in PlanSpec), SQ codes bound
    // the per-candidate cost. Query sample vec_id % 13 = 0 (q150's
    // spread sample).
    "q165_sq_ivf_topk" -> Q(
      (s, d) => {
        val emb = embeddings(s, d)
        val (mins, scales, isteps) = Sq.dimGrid(emb, "embedding")
        val coarse = SimSearch.collectCodebook(
          SimSearch.ivfCentroids(emb, "vec_id", "embedding"))
        Sq.sqIvfTopK(emb, col("id") % 13 === 0, "vec_id", "embedding",
            topK = 3, nProbe = SimSearch.IvfProbe, coarse, mins, scales, isteps)
          .select(col("q_id"), col("rn"), col("c_id"), col("sdist"))
      },
      Some {
        val recon = "(mn[i] + CAST(c.codes[i] AS DOUBLE) * istep[i])"
        s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
           |$sqCtes,
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
           |p2 AS (SELECT cand.q_id, cand.c_id,
           |         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |           list_transform(range(1, len(q.v) + 1), i ->
           |             (CAST(q.v[i] AS DOUBLE) - $recon) *
           |             (CAST(q.v[i] AS DOUBLE) - $recon))),
           |           (acc, x) -> acc + x), 6) AS sdist
           |       FROM cand
           |       JOIN e q ON q.vec_id = cand.q_id
           |       JOIN cd c ON c.vec_id = cand.c_id
           |       CROSS JOIN prm),
           |ranked AS (SELECT q_id, c_id, sdist,
           |             row_number() OVER (PARTITION BY q_id ORDER BY sdist ASC, c_id ASC) AS rn
           |           FROM p2)
           |SELECT q_id, rn, c_id, sdist FROM ranked WHERE rn <= 3""".stripMargin
      },
      "IVF+SQ composed training-free index: cell equi-join bounds candidates, SQ codes bound per-candidate cost"))
}
