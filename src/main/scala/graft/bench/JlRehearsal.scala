package graft.bench

import org.apache.spark.sql.functions._
import graft.ops.SimSearch

/** The JL distortion law measured over d′ (q158 registers the d′=16
  * point; this sweeps it): project the embeddings 64 → d′ for d′ = 8,
  * 16, 32, 64 and report mean / p95 / max |cos′ − cos| over the fixed
  * 780-pair sample. JL concentration predicts the error scale
  * ~1/√d′ — each 4× in d′ should halve the distortion columns — and
  * d′ = 64 (a square orthogonal-ish mix, no reduction) shows the
  * floor the plane family itself costs.
  *
  * Usage: `runMain graft.bench.JlRehearsal [sfDir]` — one JSON line
  * per d′ + a markdown table for SCALE.md. */
object JlRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      val emb = graft.queries.Tables.embeddings(spark, sfDir)
        .where(col("vec_id") < 40)
      val full = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("n", SimSearch.l2norm(col("v")))
        .localCheckpoint()
      val base = full.toDF("a_id", "av", "an")
        .join(full.toDF("b_id", "bv", "bn"), col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          round(SimSearch.cosine(col("av"), col("bv"), col("an"), col("bn")), 6)
            .as("cos_full"))
        .localCheckpoint()
      val rows = Seq(8, 16, 32, 64).map { dOut =>
        val proj = SimSearch.jlProject(emb, "vec_id", "embedding", dOut)
          .withColumn("pn", SimSearch.l2norm(col("pv")))
          .localCheckpoint()
        val r = base
          .join(proj.toDF("a_id", "apv", "apn"), Seq("a_id"))
          .join(proj.toDF("b_id", "bpv", "bpn"), Seq("b_id"))
          .select(col("cos_full"),
            round(SimSearch.cosine(col("apv"), col("bpv"), col("apn"), col("bpn")), 6)
              .as("cos_proj"))
          .select(abs(col("cos_proj") - col("cos_full")).as("d"))
          .agg(count(lit(1)).as("pairs"),
            round(avg(col("d")), 4).as("mean_d"),
            round(expr("percentile(d, 0.95)"), 4).as("p95_d"),
            round(max(col("d")), 4).as("max_d"))
          .head()
        proj.unpersist(true)
        val (pairs, mean, p95, mx) =
          (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        println(s"""{"family":"jl_distortion","d_out":$dOut,"pairs":$pairs,""" +
          s""""mean":$mean,"p95":$p95,"max":$mx}""")
        (dOut, pairs, mean, p95, mx)
      }
      println("\n| d' | pairs | mean |Δcos| | p95 | max |")
      println("|---|---|---|---|---|")
      rows.foreach { case (d, p, m, q, x) =>
        println(f"| $d%d | $p%d | $m%.4f | $q%.4f | $x%.4f |")
      }
    } finally spark.stop()
  }
}
