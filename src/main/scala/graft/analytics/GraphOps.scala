package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the entity model (BASELINE.json north star:
  * "DataFrame transformations + GraphX analytics"). The account/transfer
  * tables ARE a property graph (SURVEY §1.1); these operators analyse it
  * without leaving the DataFrame planner — iterative algorithms are
  * join+agg loops with a checkpoint per iteration (lineage stays
  * bounded), so Catalyst/AQE plan every step and the shuffles stay on
  * the edge key. [[toGraphX]] bridges to RDD-based GraphX for
  * cross-validation and for algorithms we don't re-express.
  *
  * Edge input convention: (src, dst) columns, any additional columns
  * ignored. All algorithms treat the graph as directed unless noted.
  */
object GraphOps {

  /** In/out/total degree per node — one shuffle per direction. */
  def degrees(edges: DataFrame): DataFrame = {
    // endpoint-tagged union + ONE grouped aggregate instead of two
    // groupBys paired by a full-outer join (BHJ-unsupported, so the
    // pairing sort-merged two node-sized frames; the union
    // partial-aggregates map-side into a single exchange, no sorts).
    // Per id, sum(is_out)/sum(1-is_out) are exactly the out/in edge
    // counts — 0 when the node only appears on the other side, which
    // is what the old coalesce(.., 0) produced.
    edges.select(col("src").as("id"), lit(1L).as("is_out"))
      .unionAll(edges.select(col("dst").as("id"), lit(0L).as("is_out")))
      .groupBy(col("id"))
      .agg(sum(col("is_out")).as("out_deg"),
        sum(lit(1L) - col("is_out")).as("in_deg"))
      .select(col("id"), col("out_deg"), col("in_deg"),
        (col("out_deg") + col("in_deg")).as("degree"))
  }

  /** Connected components (undirected) by min-label propagation WITH
    * pointer jumping: each round every node adopts the smallest label
    * among itself and its neighbors (one join + one agg on node id),
    * then shortcuts through its label's own label (one more join) — so
    * the distance a label travels doubles per round and convergence is
    * O(log diameter) rounds, not O(diameter). Labels only decrease and
    * are bounded below by the component minimum, so the fixpoint is
    * unchanged; the convergence test rides the round's aggregate. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialized once: every round joins against it — leaving it lazy
    // re-runs the upstream scan/distinct per iteration
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
      // fold the convergence test into the round's aggregation: carry the
      // old label through the min() and count diffs in the same pass —
      // one job per round instead of checkpoint-job + compare-job
      // checkpointed so the jump round's self-join reads a
      // materialized frame instead of re-running the union+agg twice
      val folded = labels.select(col("id"), col("comp"), col("comp").as("old"))
        .unionByName(viaNeighbor.withColumn("old", lit(null).cast(viaNeighbor.schema("comp").dataType)))
        .groupBy(col("id"))
        .agg(min(col("comp")).as("comp"), max(col("old")).as("old"))
        .localCheckpoint() // also truncates lineage per round
      // pointer jump: labels are node ids, so a label's own current
      // label is a valid (smaller-or-equal) label two hops away. Only
      // from round 4 on — small-world graphs converge before then and
      // would pay the extra shuffle for nothing; long chains still get
      // the doubling (3 plain hops, then 6, 12, 24, …)
      val next =
        if (iter < 3) folded
        else folded
          .join(folded.select(col("id").as("comp"), col("comp").as("comp2")),
            Seq("comp"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("comp2"), col("comp"))).as("comp"),
            col("old"))
      converged = next.filter(col("comp") =!= col("old")).isEmpty
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    labels
  }

  /** PageRank, `iters` synchronous iterations, damping `damping100`/100,
    * dangling mass redistributed uniformly. One join + one agg per
    * iteration (shuffle on dst), ranks checkpointed per round.
    *
    * FIXED-POINT arithmetic: ranks are carried as `rank * scale`
    * integers and every per-iteration op is integer `div`/`*`/`+`, so
    * partial-aggregation order cannot perturb the result — the output
    * is bit-reproducible across partitionings and engines (the q86
    * exact-power-sum trick applied to an iterative algorithm). The one
    * floating division (scaled rank → double rank) happens after the
    * last iteration. Truncation error per node per round is < 1/scale,
    * far below any analytical use of PageRank. */
  def pageRank(edges0: DataFrame, iters: Int = 10, damping100: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    // edges + out-degrees feed every round — materialize once
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint()
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) // empty graph: empty (id, rank) result, not a div-by-zero
      return nodes.select(col("id"), lit(0.0).as("rank"))
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
      .localCheckpoint()
    val base = scale * (100 - damping100) / (100 * n) // teleport term, exact Long
    var ranks = nodes.withColumn("rs", lit(scale / n))
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outDeg, Seq("id"), "left")
      // dangling mass as a broadcast 1-row frame: keeps the whole
      // iteration one lazy plan (one job per round, no driver collect)
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rs")), lit(0L)).as("dm"))
      val contribs = edges
        .join(withDeg.filter(col("out_deg").isNotNull)
          .withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("rs div out_deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .selectExpr("id",
          s"${base}L + ($damping100 * (coalesce(contrib, 0L) + dm div ${n}L)) div 100 AS rs")
        .localCheckpoint()
    }
    ranks.select(col("id"),
      (col("rs").cast("double") / lit(scale.toDouble)).as("rank"))
  }

  /** Single-source hop distances (undirected BFS) by min-distance
    * propagation — same loop shape as [[connectedComponents]]: one
    * join + one agg per round shuffling on node id, the convergence
    * test riding the round's aggregate. Converges in O(eccentricity)
    * rounds. Unreachable nodes keep a null distance. */
  def hopDistances(edges: DataFrame, source: Long, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val distType = org.apache.spark.sql.types.LongType
    var dist = sym.select(col("src").as("id")).distinct()
      .withColumn("dist", when(col("id") === source, lit(0L)).cast(distType))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbor = sym
        .join(dist.where(col("dist").isNotNull).withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
      val next = dist.select(col("id"), col("dist"), col("dist").as("old"))
        .unionByName(viaNeighbor.withColumn("old", lit(null).cast(distType)))
        .groupBy(col("id"))
        .agg(min(col("dist")).as("dist"), min(col("old")).as("old"))
        .localCheckpoint()
      converged = next.filter(
        col("dist") =!= col("old") ||
          (col("dist").isNotNull && col("old").isNull)).isEmpty
      dist = next.select(col("id"), col("dist"))
      iter += 1
    }
    dist
  }

  /** Triangle count per node (undirected, simple graph): DEGREE-ORDERED
    * orientation — each undirected edge points from the lower-(degree,
    * id) endpoint to the higher, wedges open at each node's oriented
    * out-neighbors, and the closing edge meets them in an equi-join.
    * Ordering by id alone lets a power-law hub keep all its edges
    * out-oriented (Σ C(out_deg, 2) blows up on the hub); ordering by
    * degree caps every out-degree at O(arboricity·√m̄), the standard
    * bound that makes wedge count O(m^{3/2}) on any graph. Never a
    * cross product. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // orient: src order < dst order, order = (deg, id)
    val withOrd = und
      .join(deg.toDF("src", "sdeg"), "src")
      .join(deg.toDF("dst", "ddeg"), "dst")
    val oriented = withOrd
      .filter(struct(col("sdeg"), col("src")) < struct(col("ddeg"), col("dst")))
      .select(col("src").as("lo"), col("dst").as("hi"),
        struct(col("ddeg"), col("dst")).as("hi_ord"))
      .localCheckpoint()
    // wedges open at the lowest-order corner: two out-edges of `lo`,
    // deduped by hi_ord ordering; the closing edge is oriented b→c by
    // construction (b's order < c's order and both > lo's)
    val w1 = oriented.select(col("lo"), col("hi").as("b"), col("hi_ord").as("b_ord"))
    val w2 = oriented.select(col("lo"), col("hi").as("c"), col("hi_ord").as("c_ord"))
    val wedges = w1.join(w2, "lo").filter(col("b_ord") < col("c_ord"))
    val close = oriented.select(col("lo").as("b"), col("hi").as("c"))
    val tri = wedges.join(close, Seq("b", "c"))
    val perNode = tri.select(explode(array(col("lo"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    und.select(col("src").as("id")).distinct()
      .join(perNode, Seq("id"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
  }

  /** Bridge to GraphX for cross-validation / algorithms not re-expressed.
    * Node ids must be numeric (cast to long). */
  def toGraphX(edges: DataFrame): org.apache.spark.graphx.Graph[Unit, Unit] = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => org.apache.spark.graphx.Edge(r.getLong(0), r.getLong(1), ()))
    org.apache.spark.graphx.Graph.fromEdges(e, ())
  }
}
