package graft.bench

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.streaming.SemanticStream

/** Measures the DRIFT LAW behind [[SemanticStream]]'s frozen codebook —
  * the round-6 open item: nothing quantified how dup recall decays as
  * ingested batches leave the distribution the codebook was trained
  * on, so no retrain cadence could be stated.
  *
  * Construction (deterministic, no RNG):
  *  - bootstrap + [[SemanticStream.retrain]] on the base embeddings —
  *    the codebook fits the base distribution exactly;
  *  - batch b of B slices the base corpus (`vec_id % B == b`, re-id'd
  *    disjointly) and blends every vector toward a fixed sign-flipped
  *    "new domain": v_b = (1-α)·v + α·flip(v), α = b/B — the ingest
  *    stream migrates smoothly off the trained distribution;
  *  - every batch vector arrives TWICE: the original and a canary twin
  *    perturbed ±60% per dimension (cos ≈ 0.86, safely over the 0.3
  *    dup threshold) under a HIGHER id. A twin is caught iff it shares
  *    a cell with its partner (cross-pair cosines in this stream are
  *    sign-noise ≈ 0 ≪ 0.3), so per-batch canary recall measures
  *    exactly P(near-pair co-assigned) — the quantity cell-boundary
  *    geometry degrades as the codebook stops fitting;
  *  - at batch `retrainAt` (2B/3 by default) one [[SemanticStream
  *    .retrain]] re-fits the codebook to the accumulated inverted file
  *    (base + every kept drifted vector) and the remaining batches
  *    measure the recovery.
  *
  * Per batch it reports canary recall, the batch's max-cell share
  * (assignment imbalance — the join-cost face of the same drift),
  * probe-candidate volume, and ingest seconds. What the measurement
  * established (SCALE.md "Online-index maintenance"): near-pair
  * co-assignment is robust to centroid placement (full domain shift
  * costs only ~3 recall points at p=1) and retraining does NOT win
  * those points back — finer cells straddle more; retrain is the
  * BALANCE remedy (collapse mode's top-cell share), multi-probe
  * ingest (`probes` arg → [[SemanticStream.ingestVectors]]) is the
  * RECALL remedy (p=2 holds drifted recall ≈ 0.99 at unchanged
  * candidate volume), and planted canaries are the in-band monitor
  * for both.
  *
  * Usage: `runMain graft.bench.SemanticRehearsal [batches=24]
  * [retrainAt=16] [sfDir=/root/testdata/sf0.1] [k=32] [probes=1]`. */
object SemanticRehearsal {

  /** Deterministic per-dimension sign flip — the fixed "new domain"
    * of the `shift` mode (same orthonormal-transform discipline as
    * [[ScaleLaws.amplifyEmbeddings]], constant across batches): the
    * drifted distribution stays as SPREAD as the base, it just sits
    * where no trained centroid does. */
  private def flip(v: Column): Column =
    transform(v, (x, i) =>
      x * when(pmod(hash(lit(42), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0)))

  /** The `collapse` mode's new domain: keep ~1 dimension in 8, zero
    * the rest — drift toward a LOW-DIMENSIONAL subspace, the domain
    * shift that wrecks the quantizer's BALANCE rather than pair
    * co-assignment (all drifted mass crowds into the few cells whose
    * centroids have the largest incidental subspace component, and the
    * per-batch cell self-join cost grows with Σ|cell|²). */
  private def collapse(v: Column): Column =
    transform(v, (x, i) =>
      x * when(pmod(hash(lit(7), i), lit(8)) === 0, lit(1.0)).otherwise(lit(0.0)))

  /** ±60% per-(id, dim) canary perturbation: cos(v, twin) =
    * 1/√(mean f²) ≈ 0.86 — a real near-dup, not a byte copy (a copy
    * would co-assign trivially and measure nothing), sized so trained-
    * era recall sits on the sensitive slope of the co-assignment curve
    * rather than its plateau (±30% measured ≈ 0.99 recall at K=16 with
    * barely any drift response; the law needs dynamic range). */
  private def perturb(v: Column, id: Column): Column =
    transform(v, (x, i) =>
      x * when(pmod(hash(id, i), lit(2)) === 0, lit(1.6)).otherwise(lit(0.4)))

  /** Drift schedule: ramp linearly to the new domain over the first
    * half of the stream, then SETTLE there (α = 1). A never-ending
    * ramp would keep decaying recall straight through a retrain and
    * measure nothing about recovery; ramp-then-plateau is the
    * domain-shift scenario a retrain cadence is actually for. */
  def alphaOf(b: Int, batches: Int): Double =
    math.min(1.0, 2.0 * b / batches)

  /** Batch b: disjoint base slice, α-blended toward the mode's new
    * domain, each vector plus its canary twin (twin id = orig id + 1). */
  def batchOf(base: DataFrame, b: Int, batches: Int,
      mode: String = "shift"): DataFrame = {
    val alpha = alphaOf(b, batches)
    val v = col("embedding").cast("array<double>")
    val domain = mode match {
      case "shift" => flip(v)
      case "collapse" => collapse(v)
      case m => throw new IllegalArgumentException(s"unknown drift mode $m")
    }
    val drifted = base.where(pmod(col("vec_id"), lit(batches)) === b)
      .select(
        (lit(10000000L) + col("vec_id") * 1000L).as("vec_id"),
        zip_with(v, domain, (x, fx) =>
          x * lit(1 - alpha) + fx * lit(alpha)).as("embedding"))
    drifted.unionByName(drifted.select(
      (col("vec_id") + 1).as("vec_id"),
      perturb(col("embedding"), col("vec_id")).as("embedding")))
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(24)
    val retrainAt = args.lift(1).map(_.toInt).getOrElse(batches * 2 / 3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    // 2× the query default: the drift law is boundary geometry, and at
    // K=16 over 2k base vectors the cells are so coarse that even a
    // fully-drifted stream barely straddles them (measured ~0.96 recall
    // at α=1) — K=32 is also the K the √n rule would pick at this n
    val k = args.lift(3).map(_.toInt).getOrElse(2 * graft.ops.SimSearch.IvfK)
    // the dup-recall lever under test in the p-sweep: batch-side probe
    // list width (assignment and the stored file are unchanged)
    val probes = args.lift(4).map(_.toInt).getOrElse(1)
    // > 0 switches maintenance to the MECHANIZED policy: no fixed
    // retrainAt — every batch first runs
    // SemanticStream.retrainIfUnbalanced(threshold) and the log records
    // when the imbalance trigger actually fires on the drift stream
    val autoThreshold = args.lift(5).map(_.toDouble).getOrElse(0.0)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      val base = graft.queries.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .localCheckpoint()
      val all = Seq("shift", "collapse").map { mode =>
        val root = graft.Temps.dir(s"semantic-rehearsal-$mode-p$probes")
        SemanticStream.bootstrap(base, root, k)
        SemanticStream.retrain(spark, root, k) // codebook fits the BASE distribution
        val rows = (0 until batches).map { b =>
          var retrainSecs = 0.0
          if (autoThreshold <= 0 && b == retrainAt) {
            val r0 = System.nanoTime()
            SemanticStream.retrain(spark, root, k)
            retrainSecs = (System.nanoTime() - r0) / 1e9
          }
          val batch = batchOf(base, b, batches, mode).localCheckpoint()
          val t0 = System.nanoTime()
          val man = SemanticStream.ingestVectors(batch, root, probes = probes)
          val secs = (System.nanoTime() - t0) / 1e9
          batch.unpersist()
          // canaries: odd re-ids (orig + 1); caught = flagged any-dup
          val twins = man.where(col("vec_id") % 2 === 1)
          val planted = twins.count()
          val caught = twins.where(col("status") =!= "kept").count()
          val recall = caught.toDouble / planted
          val maxShare = SemanticStream.batchImbalance(man)
          // mechanized policy: the batch-level imbalance IS the trigger
          // input (the stored index is dedup-shielded from collapse
          // drift — see SemanticStream.cellImbalance's note)
          if (autoThreshold > 0 && maxShare >= autoThreshold) {
            val r0 = System.nanoTime()
            SemanticStream.retrain(spark, root, k)
            retrainSecs = (System.nanoTime() - r0) / 1e9
          }
          // the probe's join volume this batch: batch×corpus meeting on
          // cell plus the batch-internal pairs — the cost face drift
          // inflates when assignments unbalance (Σ over cells)
          val batchHist = man.groupBy(col("cell")).agg(count(lit(1)).as("bn"))
          val corpusHist = graft.sinks.Layout
            .readStatic(spark, root, SemanticStream.CellsEntity).get
            .groupBy(col("cell")).agg(count(lit(1)).as("cn"))
          val cand = batchHist.join(corpusHist, Seq("cell"), "left")
            .agg(sum(col("bn") * coalesce(col("cn"), lit(0L)) +
              col("bn") * (col("bn") - 1) / 2).cast("long"))
            .head().getLong(0)
          val alpha = alphaOf(b, batches)
          println(f"""{"family":"semantic_ingest_drift","mode":"$mode","probes":$probes,"auto_threshold":$autoThreshold%.2f,"batch":$b,""" +
            f""""alpha":$alpha%.3f,"planted":$planted,"caught":$caught,""" +
            f""""recall":$recall%.3f,"max_cell_share":$maxShare%.3f,""" +
            f""""probe_candidates":$cand,"secs":${math.round(secs * 100) / 100.0},""" +
            f""""retrain_secs":${math.round(retrainSecs * 100) / 100.0}}""")
          man.unpersist()
          (b, alpha, planted, caught, recall, maxShare, cand, secs, retrainSecs)
        }
        (mode, rows)
      }
      println("\n| mode | batch | alpha | recall | max cell share | probe cand | ingest secs | retrain secs |")
      println("|---|---|---|---|---|---|---|---|")
      all.foreach { case (mode, rows) =>
        rows.foreach { case (b, a, _, _, r, m, c, s, rs) =>
          println(f"| $mode | $b%d | $a%.3f | $r%.3f | $m%.3f | $c%d | $s%.2f | $rs%.2f |")
        }
      }
      def mean(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
      all.foreach { case (mode, rows) =>
        val pre = rows.filter(_._1 < retrainAt)
        val post = rows.filter(_._1 >= retrainAt)
        println(f"$mode: recall trained=${mean(pre.take(3).map(_._5))}%.3f " +
          f"drifted=${mean(pre.takeRight(3).map(_._5))}%.3f " +
          f"retrained=${mean(post.map(_._5))}%.3f; " +
          f"max-cell-share trained=${mean(pre.take(3).map(_._6))}%.3f " +
          f"drifted=${mean(pre.takeRight(3).map(_._6))}%.3f " +
          f"retrained=${mean(post.map(_._6))}%.3f; " +
          f"probe-cand drifted=${mean(pre.takeRight(3).map(_._7.toDouble))}%.0f " +
          f"retrained=${mean(post.map(_._7.toDouble))}%.0f")
      }
    } finally spark.stop()
  }
}
