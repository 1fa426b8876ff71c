package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Graph analytics on hand-computable graphs, cross-validated against
  * GraphX where the results are exact integers. */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def df(edges: (Long, Long)*) = {
    import spark.implicits._
    edges.toSeq.toDF("src", "dst")
  }

  test("degrees on a small directed graph") {
    val d = GraphOps.degrees(df(1L -> 2L, 1L -> 3L, 2L -> 3L)).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("out_deg"), r.getAs[Long]("in_deg"))).toMap
    assert(d(1L) === (2L, 0L))
    assert(d(2L) === (1L, 1L))
    assert(d(3L) === (0L, 2L))
  }

  test("connected components match GraphX on a two-component graph") {
    val edges = df(1L -> 2L, 2L -> 3L, 10L -> 11L, 12L -> 11L)
    val mine = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(mine === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    val graphx = GraphOps.toGraphX(edges).connectedComponents()
      .vertices.collect().toMap
    assert(mine === graphx.map { case (k, v) => (k: Long) -> (v: Long) })
  }

  test("components converge on a 100-node chain within 20 rounds (pointer jumping)") {
    // plain neighbor-min propagation needs ~100 rounds on a path graph;
    // with per-round label shortcutting the min travels 2^r hops, so
    // maxIter = 20 only suffices if pointer jumping actually works
    val chain = df((0L until 99L).map(i => i -> (i + 1)): _*)
    val comps = GraphOps.connectedComponents(chain, maxIter = 20).collect()
      .map(r => r.getAs[Long]("comp")).distinct
    assert(comps === Array(0L))
  }

  test("pageRank: known values on a 2-cycle and a dangling chain") {
    // 2-cycle: symmetric → ranks 0.5 / 0.5 at any iteration count
    val cyc = GraphOps.pageRank(df(1L -> 2L, 2L -> 1L), iters = 10).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rank")).toMap
    assert(math.abs(cyc(1L) - 0.5) < 1e-12)
    assert(math.abs(cyc(2L) - 0.5) < 1e-12)
    // total mass conserved (dangling node 2 redistributes): 1 -> 2
    val chain = GraphOps.pageRank(df(1L -> 2L), iters = 8).collect()
      .map(r => r.getAs[Double]("rank")).sum
    assert(math.abs(chain - 1.0) < 1e-9)
  }

  test("pageRank matches GraphX staticPageRank on a dangling-free graph") {
    // GraphX's staticPageRank initializes every rank to 1.0 and lets
    // dangling mass vanish, where ours initializes to 1/N and
    // redistributes it; on a graph with NO dangling nodes the two
    // recurrences are identical up to the factor N (linearity), so
    // ourRank * N must equal GraphX's rank at every iteration count.
    val edges = df(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 2L)
    val n = 4.0
    val mine = GraphOps.pageRank(edges, iters = 12).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rank") * n).toMap
    val graphx = GraphOps.toGraphX(edges).staticPageRank(12, resetProb = 0.15)
      .vertices.collect().toMap
    assert(mine.keySet === graphx.keySet.map(k => k: Long))
    for ((id, r) <- mine)
      // integer fixed-point quantizes at 1e-12 per round; 1e-6 is ~10^5
      // times looser while still catching any recurrence mismatch
      assert(math.abs(r - graphx(id)) < 1e-6,
        s"node $id: ours=$r graphx=${graphx(id)}")
  }

  test("hopDistances: BFS levels on a chain + branch, unreachable stays null") {
    // 1-2-3-4 chain, 2-5 branch, isolated pair 8-9
    val g = df(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 5L, 8L -> 9L)
    val got = GraphOps.hopDistances(g, source = 1L).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got === Map(
      1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L), 4L -> Some(3L),
      5L -> Some(2L), 8L -> None, 9L -> None))
  }

  test("triangle counts match GraphX on a clique-plus-tail") {
    // K4 on {1,2,3,4} (each node in 3 triangles) + tail 4-5 (0 triangles)
    val edges = df(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L)
    val mine = GraphOps.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("triangles")).toMap
    assert(mine === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
    val graphx = GraphOps.toGraphX(edges).partitionBy(
        org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices.collect().toMap
    assert(mine === graphx.map { case (k, v) => (k: Long) -> v.toLong })
  }
}
