package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.GraphOps
import Tables._

/** Graph analytics (north star: "DataFrame transformations + GraphX
  * analytics") over a deterministic user↔topic graph derived from the
  * `events` table: src = user_id, dst = 1000 + (k mod 50) where k is the
  * props payload — a bipartite interaction graph with shared-topic
  * connectivity. The DuckDB oracles rebuild the same edges in SQL;
  * components use a recursive CTE as the ground-truth closure. */
object GraphQueries {

  /** Distinct edge list, materialized (localCheckpoint): every graph
    * algorithm reads the edge set 2-4 times (symmetrize, node universe,
    * per-iteration joins) — left lazy, each read re-runs the events
    * scan + regex + 600k-row distinct. The distinct set is tiny
    * (≤ |users|×|topics|), so this is the classic "shrink, then
    * materialize the small thing" scale pattern. */
  private def edges(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("user_id").as("src"),
      (lit(1000) + regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
        .cast("bigint") % 50).as("dst"))
      .distinct()
      .localCheckpoint()

  private val edgesSql =
    """SELECT DISTINCT user_id AS src,
      | 1000 + CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 50 AS dst
      |FROM events""".stripMargin

  /** Unrolled fixed-point PageRank oracle mirroring
    * [[GraphOps.pageRank]]'s integer arithmetic exactly: rs0 = S // n,
    * rs' = (15·S)//(100·n) + (85·(contrib + dangling//n))//100, where
    * contrib sums per-edge `rs // out_deg`. All-BIGINT until the final
    * rank = rs / S double division. */
  private val pageRankSql: String = {
    val S = "1000000000000"
    val iters = (1 to 5).map { i =>
      val p = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst AS id, CAST(sum($p.rs // od.out_deg) AS BIGINT) AS contrib
         |  FROM e JOIN $p ON $p.id = e.src JOIN od ON od.id = e.src GROUP BY 1),
         |d$i AS (
         |  SELECT CAST(coalesce(sum(rs), 0) AS BIGINT) AS dm
         |  FROM $p WHERE id NOT IN (SELECT id FROM od)),
         |r$i AS (
         |  SELECT n.id,
         |         (SELECT b FROM consts) +
         |         (85 * (coalesce(c.contrib, 0) + (SELECT dm FROM d$i) // (SELECT nn FROM consts))) // 100 AS rs
         |  FROM nodes n LEFT JOIN c$i c ON n.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($edgesSql),
       |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |od AS (SELECT src AS id, count(*) AS out_deg FROM e GROUP BY 1),
       |consts AS (SELECT count(*) AS nn, $S // count(*) AS rs0,
       |                  (15 * $S) // (100 * count(*)) AS b FROM nodes),
       |r0 AS (SELECT id, (SELECT rs0 FROM consts) AS rs FROM nodes),
       |$iters
       |SELECT id, CAST(rs AS DOUBLE) / $S.0 AS rank FROM r5""".stripMargin
  }

  def defs: Map[String, Q] = Map(
    "q70_degrees" -> Q(
      (s, d) => GraphOps.degrees(edges(s, d)),
      Some(s"""WITH e AS ($edgesSql),
              |o AS (SELECT src AS id, count(*) AS out_deg FROM e GROUP BY 1),
              |i AS (SELECT dst AS id, count(*) AS in_deg FROM e GROUP BY 1)
              |SELECT coalesce(o.id, i.id) AS id,
              |       coalesce(out_deg, 0) AS out_deg,
              |       coalesce(in_deg, 0) AS in_deg,
              |       coalesce(out_deg, 0) + coalesce(in_deg, 0) AS degree
              |FROM o FULL OUTER JOIN i ON o.id = i.id""".stripMargin),
      "node degrees: graph analytics pillar"),

    "q71_components" -> Q(
      (s, d) => GraphOps.connectedComponents(edges(s, d)),
      Some(s"""WITH RECURSIVE e AS ($edgesSql),
              |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
              |reach(id, r) AS (
              |  SELECT src, src FROM sym
              |  UNION
              |  SELECT sym.dst, reach.r FROM reach JOIN sym ON sym.src = reach.id)
              |SELECT id, min(r) AS comp FROM reach GROUP BY 1""".stripMargin),
      "connected components (min-label propagation vs recursive-CTE closure)"),

    // fixed-point ranks (rank * 1e12 integers, integer div/mul per
    // round) make the iteration bit-reproducible, so the oracle is an
    // unrolled 5-iteration CTE doing the identical integer arithmetic;
    // the single double division happens after the last round.
    "q72_pagerank" -> Q(
      (s, d) => GraphOps.pageRank(edges(s, d), iters = 5),
      Some(pageRankSql),
      "PageRank (join+agg iterations, dangling mass redistributed; fixed-point)"),

    // BFS hop distances from the hub topic node (min-distance
    // propagation vs a recursive-CTE ground truth)
    "q74_bfs" -> Q(
      (s, d) => GraphOps.hopDistances(edges(s, d), source = 1000L),
      Some(s"""WITH RECURSIVE e AS ($edgesSql),
              |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
              |reach(id, dd) AS (
              |  SELECT CAST(1000 AS BIGINT), CAST(0 AS BIGINT)
              |  UNION
              |  SELECT sym.dst, reach.dd + 1 FROM reach JOIN sym ON sym.src = reach.id
              |  WHERE reach.dd < 20),
              |nodes AS (SELECT DISTINCT src AS id FROM sym),
              |md AS (SELECT id, min(dd) AS dist FROM reach GROUP BY 1)
              |SELECT n.id, md.dist FROM nodes n LEFT JOIN md ON n.id = md.id""".stripMargin),
      "single-source BFS hop distances (O(ecc) rounds vs recursive CTE)"),

    "q73_triangles" -> Q(
      (s, d) => GraphOps.triangleCounts(edges(s, d))
        .groupBy(col("triangles")).agg(count(lit(1)).as("n_nodes")),
      Some(s"""WITH e AS ($edgesSql),
              |und AS (
              |  SELECT src, dst FROM (SELECT src, dst FROM e UNION SELECT dst, src FROM e)
              |  WHERE src <> dst),
              |canon AS (SELECT DISTINCT src AS a, dst AS b FROM und WHERE src < dst),
              |tri AS (
              |  SELECT ab.a, ab.b, bc.c AS c FROM canon ab
              |  JOIN (SELECT a AS b, b AS c FROM canon) bc ON ab.b = bc.b
              |  JOIN (SELECT a, b AS c FROM canon) ac ON ab.a = ac.a AND bc.c = ac.c),
              |per_node AS (
              |  SELECT id, count(*) AS triangles FROM (
              |    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
              |  GROUP BY 1),
              |nodes AS (SELECT DISTINCT src AS id FROM und)
              |SELECT coalesce(p.triangles, 0) AS triangles, count(*) AS n_nodes
              |FROM nodes n LEFT JOIN per_node p ON n.id = p.id
              |GROUP BY 1""".stripMargin),
      "per-node triangle counts histogram (wedge equi-joins)"))
}
