package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.SemanticStream

/** Measure-FIRST probe for the semantic franken-doc residual idea
  * (carried r7 item): token-space recomposition is closed (q147/q170),
  * but an embedding BLEND — a vector mixed from two stored corpus
  * vectors, e.g. a doc stitched from two sources then re-embedded —
  * passes the cosine dup gate when neither parent alone reaches the
  * threshold. The candidate remedy is a nearest-stored-neighbor
  * RESIDUAL test: flag an arriving vector whose top-1 cosine against
  * the stored index sits in a suspicious band (high enough to suggest
  * recomposition, below the dup threshold's certainty). Before
  * implementing any gate, this harness measures whether the two
  * populations are separable at all:
  *
  *   - `blend` rows: normalize((v_a + v_b)/2) for in-corpus pairs
  *     (a, b) from DIFFERENT cells (the evasive case — same-cell
  *     blends score near their parents and the existing gate already
  *     sees them);
  *   - `novel` rows: orthonormal sign-flip twists of corpus vectors
  *     ([[ScaleLaws.amplifyEmbeddings]]'s decorrelation — genuinely
  *     new directions with the sphere's irreducible ~N(0, 1/√d)
  *     cosine floor).
  *
  * For each population: the top-1 stored cosine (served from the
  * maintained index, nProbe widened so probe misses don't pollute the
  * measurement) and flag rates over a threshold grid. The FP/FN
  * trade-off printed here decides whether a residual gate is worth
  * its per-ingest cost (SCALE.md records the verdict).
  * Usage: `runMain graft.bench.FrankenResidualBench
  * [sfDir=/root/testdata/sf0.1]`. */
object FrankenResidualBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      val emb = graft.queries.Tables.embeddings(spark, sfDir)
        .localCheckpoint()
      val corpus = emb.where(col("vec_id") % 5 =!= 0)
      val root = graft.Temps.dir("franken-residual")
      SemanticStream.bootstrap(corpus, root)
      val cells = graft.sinks.Layout
        .readStatic(spark, root, SemanticStream.CellsEntity).get
        .select(col("id"), col("cell"), col("v"))
        .localCheckpoint()
      // blends: consecutive corpus ids in DIFFERENT cells
      val blends = cells.toDF("a_id", "a_cell", "av")
        .join(cells.toDF("b_id", "b_cell", "bv"),
          col("b_id") === col("a_id") + 1 && col("a_cell") =!= col("b_cell"))
        .select((col("a_id") + lit(2000000L)).as("vec_id"),
          zip_with(col("av"), col("bv"), (x, y) => (x + y) / 2.0)
            .as("embedding"))
      // novel: decorrelated twists (copy 1 of the amplifier)
      val novel = ScaleLaws.amplifyEmbeddings(corpus, 2)
        .where(col("vec_id") % 2 === 1) // the twisted copies only
        .select((col("vec_id") + lit(3000000L)).as("vec_id"),
          col("embedding"))
      for ((name, probe) <- Seq("blend" -> blends, "novel" -> novel)) {
        val top1 = SemanticStream.queryTopK(probe, root, topK = 1,
            nProbe = 8)
          .select(col("q_id"), col("cos"))
          .localCheckpoint()
        val nuq = probe.count()
        val stats = top1.agg(
          count(lit(1)).as("n"),
          expr("percentile(cos, 0.5)").as("p50"),
          expr("percentile(cos, 0.9)").as("p90"),
          expr("percentile(cos, 0.99)").as("p99"),
          sum(when(col("cos") >= 0.5, 1L).otherwise(0L)).as("ge50"),
          sum(when(col("cos") >= 0.6, 1L).otherwise(0L)).as("ge60"),
          sum(when(col("cos") >= 0.7, 1L).otherwise(0L)).as("ge70"),
          sum(when(col("cos") >= 0.8, 1L).otherwise(0L)).as("ge80")).head
        def d(x: Any): Double = x match {
          case null => 0.0
          case v: java.lang.Number => v.doubleValue()
        }
        println(s"""{"family":"franken_residual","variant":"$name",""" +
          s""""rows":$nuq,"served":${stats.getLong(0)},""" +
          s""""p50":${math.round(d(stats.get(1)) * 1000) / 1000.0},""" +
          s""""p90":${math.round(d(stats.get(2)) * 1000) / 1000.0},""" +
          s""""p99":${math.round(d(stats.get(3)) * 1000) / 1000.0},""" +
          s""""ge50":${stats.getLong(4)},"ge60":${stats.getLong(5)},""" +
          s""""ge70":${stats.getLong(6)},"ge80":${stats.getLong(7)}}""")
        top1.unpersist()
      }
    } finally spark.stop()
  }
}
