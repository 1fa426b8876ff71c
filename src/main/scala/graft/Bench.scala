package graft

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Queries run in sorted name
  * order after an untimed warmup action (JVM/codegen/class-load cost
  * lands in the warmup, not in whichever query happens to run first —
  * per-query numbers stay comparable across rounds). */
object Bench {

  /** 1-minute system load average (from /proc/loadavg; -1 if
    * unreadable). Sibling processes on this VM swing bench totals
    * 2–3×, so the artifact records the load it ran under — a reader
    * comparing rounds can reject loaded runs instead of guessing. */
  def loadAvg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Exception => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt // driver contract: local[32]
    val loadBefore = loadAvg()
    if (loadBefore > cpus / 4.0)
      System.err.println(f"[bench] WARNING: loadavg $loadBefore%.1f before the run " +
        s"(threshold ${cpus / 4.0}) — sibling load inflates wall-clock; " +
        "numbers from this run are not comparable to idle-machine runs")
    val spark = Sessions.local(cpus)
    // warmup: a scan + shuffle + broadcast join through the same tables
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // best-of-2 per query: first execution pays one-time codegen/classload
    // for that query's expressions and this VM shows heavy run-to-run
    // jitter; min-of-n is the standard way to report the reproducible cost
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      // drop blocks leaked by localCheckpoint-ing queries so later
      // queries aren't measured under earlier queries' memory pressure
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // load_before/load_after make the artifact self-adjudicating: a
    // committed idle run has both ≪ cpus; a driver run under sibling
    // sbt/test load shows it in-band instead of looking like a 2–3×
    // regression (see the round-5 BENCH divergence)
    val suffix = s""""sf":"$sfDir","load_before":$loadBefore,"load_after":${loadAvg()}}"""
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" + suffix
    // the FULL per-query map goes to a file (+ the committed
    // BENCH_full_r{N}.json): the driver tail-captures only ~2000 chars
    // of stdout, so a 151-query map can never parse from the tail
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullLine + "\n")
    catch { case e: Exception => System.err.println(s"[bench] file write failed: $e") }
    // stdout gets a BUDGETED line that FITS the tail and parses: 3-dp
    // values, per-query entries kept (in sorted-name order) until the
    // map reaches the budget, with the truncation made explicit
    println(budgetedLine(results, total, outFile, suffix))
    spark.stop()
  }

  /** The tail-sized stdout line (the harness keeps only ~2000 chars of
    * stdout, so the full per-query map can never parse from there —
    * BenchLineSpec pins that this one always fits AND parses). */
  /** Locale-pinned 3-dp formatting: the f interpolator is
    * locale-sensitive — under a comma-decimal default locale (de_DE
    * etc.) it would emit "1,234" and break the JSON contract
    * BenchLineSpec pins. */
  private def dp3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def budgetedLine(results: Seq[(String, Double)], total: Double,
      outFile: String, suffix: String, mapBudget: Int = 1400): String = {
    // TOP-BY-TIME, not alphabetical (r14 verdict: the sorted-name prefix
    // kept exactly the sub-second long tail and every hot query fell off
    // the line, so three rounds of driver records saw none of the
    // optimization surface). Entries are ranked by descending time and
    // kept until the budget fills — the regression check needs the
    // expensive queries; the full map still goes to `outFile` and the
    // committed BENCH_full artifact. Ties break by name for determinism.
    val entries = results
      .sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) => "\"" + k + "\":" + dp3(v) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    entries.foreach { e =>
      if (used + e.length + 1 <= mapBudget) { kept += e; used += e.length + 1 }
    }
    s"""{"metric":"total","value":${dp3(total)},"unit":"sec",""" +
      s""""queries":${kept.mkString("{", ",", "}")},""" +
      s""""queries_total":${results.size},"queries_reported":${kept.size},""" +
      s""""full_map_file":"$outFile",""" + suffix
  }
}
