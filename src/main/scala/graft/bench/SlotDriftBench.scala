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
  * index share falls back toward the trained band) — and one arm with
  * the WIRED trigger ([[SemanticStream.slotRetrainIfUnbalanced]] on
  * each batch's manifest, the r13 mechanization): its rows carry
  * `fired` so the artifact shows the trigger firing mid-stream, under
  * drift, without an operator picking the batch. JSON rows, family
  * `slot_drift`; `retrain` ∈ frozen | fixed | auto.
  *
  * Usage: `runMain graft.bench.SlotDriftBench [batches=12]
  * [sfDir=/root/testdata/sf0.1] [slotK=64] [autoThreshold=0.25]`. */
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
      val autoThreshold = args.lift(3).map(_.toDouble).getOrElse(0.25)
      // the capped arm's cadence: at 12 batches and persistent-drift
      // tail ~1/3 of the stream, cap 3 bounds the tail to ≤ 2 fires
      val minBetween = args.lift(4).map(_.toInt).getOrElse(3)
      for (mode <- Seq("frozen", "fixed", "auto", "capped")) {
        val root = graft.Temps.dir(s"slot-drift-$mode")
        SemanticStream.bootstrap(base, root, withSq = true,
          withSlots = true, slotK = slotK, slotRounds = 3)
        (0 until batches).foreach { b =>
          var retrainSecs = 0.0
          if (mode == "fixed" && b == batches * 2 / 3) {
            val t0 = System.nanoTime()
            SemanticStream.slotRetrain(spark, root, slotK)
            retrainSecs = (System.nanoTime() - t0) / 1e9
          }
          val batch = SemanticRehearsal
            .batchOf(base, b, batches, "collapse").localCheckpoint()
          val t0 = System.nanoTime()
          val man = SemanticStream.ingestVectors(batch, root)
          val secs = (System.nanoTime() - t0) / 1e9
          // read the batch share BEFORE any triggered retrain retags
          // the store — the row reports the signal the trigger saw
          val batchSlots = SemanticStream.slotBatchImbalance(spark, root, man)
          // the wired trigger (same call run() arms), fed the share
          // already computed above so the aggregation isn't paid (and
          // billed into retrain_secs) twice per batch
          var fired = false
          if (mode == "auto" || mode == "capped") {
            // "capped" = the wired trigger under the r14 cadence cap:
            // persistent drift fires ⌈drifted/cap⌉ retrains instead of
            // one per drifted batch, with recall riding the
            // post-retrain book between fires (slot_drift_serve row)
            val t1 = System.nanoTime()
            fired = SemanticStream.slotRetrainIfUnbalanced(spark, root,
              man, autoThreshold, slotK, share = Some(batchSlots),
              minBatchesBetween = if (mode == "capped") minBetween else 0)
              .nonEmpty
            retrainSecs = (System.nanoTime() - t1) / 1e9
          }
          val slotImb = SemanticStream.slotCellImbalance(spark, root)
          man.unpersist(); batch.unpersist()
          println(f"""{"family":"slot_drift","retrain":"$mode",""" +
            f""""slot_k":$slotK,"batch":$b,"fired":$fired,""" +
            f""""alpha":${SemanticRehearsal.alphaOf(b, batches)}%.3f,""" +
            f""""slot_imb":$slotImb%.4f,""" +
            f""""batch_slot_imb":$batchSlots%.4f,""" +
            f""""secs":${math.round(secs * 100) / 100.0},""" +
            f""""retrain_secs":${math.round(retrainSecs * 100) / 100.0}}""")
        }
        // the SERVING face after the stream: what drift under a frozen
        // vs retrained slot book costs at query time. Collapse drift
        // crowds slots into few cells, so the harm is SELECTIVITY, not
        // reachability — drifted queries' probes land in the crowded
        // cells (their aligned neighbors are there, recall holds) but
        // gather admits a blown-up candidate set; the retrained book
        // re-spreads the region and restores the gather bill. Queries
        // = drifted kept vectors; gold = covering MaxSim over the
        // accumulated store; served = the slot face, cut disarmed
        // (drift geometry is decorrelated — the pinned policy's
        // documented disarm case).
        val corpus = graft.sinks.Layout
          .readStatic(spark, root, SemanticStream.CellsEntity).get
          .select(col("id").as("vec_id"), col("v").as("embedding"))
          .localCheckpoint()
        val n = corpus.count()
        val qs = corpus.where(col("vec_id") >= 10000000L &&
            pmod(col("vec_id"), lit(3)) === 0)
          .localCheckpoint()
        val nq = qs.count()
        if (nq > 0) {
          val avgCand = SemanticStream.slotGatherCount(qs, root,
              slotNProbe = 2)
            .agg(avg(col("n_cand"))).collect().head.getDouble(0)
          val gold = graft.ops.LateInteraction.maxSimTopK(qs, corpus,
              "vec_id", "embedding", k = 3, prefilterC = n.toInt)
            .select("q_id", "c_id").localCheckpoint()
          val served = SemanticStream.queryTopKMaxSimSlots(qs, root,
              topK = 3, prefilterC = 32, slotNProbe = 2)
            .select("q_id", "c_id")
          val hits = gold.join(served, Seq("q_id", "c_id"), "left_semi")
            .count()
          val goldN = gold.count()
          println(f"""{"family":"slot_drift_serve","retrain":"$mode",""" +
            f""""slot_k":$slotK,"n":$n,"queries":$nq,"gold":$goldN,""" +
            f""""avg_cand":${math.round(avgCand)},""" +
            f""""cand_frac":${math.round(avgCand * 10000.0 / n) / 10000.0},""" +
            f""""hits":$hits,""" +
            f""""recall3":${math.round(hits * 10000.0 / goldN) / 10000.0}}""")
          gold.unpersist()
        }
        qs.unpersist(); corpus.unpersist()
      }
    } finally spark.stop()
  }
}
