package graft.bench

import org.apache.spark.sql.functions._

import graft.streaming.SemanticStream

/** Slot-codebook drift rehearsal — the measured row behind
  * [[SemanticStream.slotCellImbalance]] and [[SemanticStream
  * .slotRetrain]] (r11 verdict #2: the slot book was frozen forever
  * and gather-coverage decay under drift was invisible). Reuses the
  * ingest-drift scenario [[SemanticRehearsal]] already generates
  * (collapse mode: arriving vectors drift toward a low-dimensional
  * subspace, the balance-wrecking shift) against a slot-armed store,
  * and records per batch:
  *
  *   - `slot_imb`  — index-level top-cell share of the stored slot
  *     index (the gather-selectivity face; DILUTED by the balanced
  *     base corpus and dedup-shielded like the main index's metric);
  *   - `batch_slot_imb` — top-cell share of THIS batch's kept slot
  *     rows (the arriving distribution — where collapse drift shows
  *     first, the slot analog of the batchImbalance trigger);
  *
  * one arm frozen, one arm with [[SemanticStream.slotRetrain]] at the
  * 2/3 mark — the recovery the lifecycle buys (re-spread centroids →
  * index share falls back toward the trained band). JSON rows, family
  * `slot_drift`.
  *
  * Usage: `runMain graft.bench.SlotDriftBench [batches=12]
  * [sfDir=/root/testdata/sf0.1] [slotK=64]`. */
object SlotDriftBench {

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(12)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val slotK = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      val base = graft.queries.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .localCheckpoint()
      for (retrain <- Seq(false, true)) {
        val root = graft.Temps.dir(s"slot-drift-r$retrain")
        SemanticStream.bootstrap(base, root, withSq = true,
          withSlots = true, slotK = slotK, slotRounds = 3)
        (0 until batches).foreach { b =>
          var retrainSecs = 0.0
          if (retrain && b == batches * 2 / 3) {
            val t0 = System.nanoTime()
            SemanticStream.slotRetrain(spark, root, slotK)
            retrainSecs = (System.nanoTime() - t0) / 1e9
          }
          val batch = SemanticRehearsal
            .batchOf(base, b, batches, "collapse").localCheckpoint()
          val t0 = System.nanoTime()
          val man = SemanticStream.ingestVectors(batch, root)
          val secs = (System.nanoTime() - t0) / 1e9
          val keptIds = man.where(col("status") === "kept")
            .select(col("vec_id").as("id"))
          val batchSlots = graft.sinks.Layout
            .readStatic(spark, root, SemanticStream.SlotCellsEntity).get
            .join(keptIds, Seq("id"), "left_semi")
            .groupBy(col("cell")).agg(count(lit(1)).as("n"))
            .agg((max(col("n")).cast("double") / sum(col("n"))).as("s"))
            .collect().headOption
            .map(r => if (r.isNullAt(0)) 0.0 else r.getDouble(0))
            .getOrElse(0.0)
          val slotImb = SemanticStream.slotCellImbalance(spark, root)
          man.unpersist(); batch.unpersist()
          println(f"""{"family":"slot_drift","retrain":$retrain,""" +
            f""""slot_k":$slotK,"batch":$b,""" +
            f""""alpha":${SemanticRehearsal.alphaOf(b, batches)}%.3f,""" +
            f""""slot_imb":$slotImb%.4f,""" +
            f""""batch_slot_imb":$batchSlots%.4f,""" +
            f""""secs":${math.round(secs * 100) / 100.0},""" +
            f""""retrain_secs":${math.round(retrainSecs * 100) / 100.0}}""")
        }
      }
    } finally spark.stop()
  }
}
