package graft.bench

/** Dress-rehearsal for `graft.etl.Extract` at an amplified block range —
  * closes the loop on SCALE.md's K4 claim that a static MERGE's rewrite
  * cost is the DIMENSION'S SIZE (not the batch's), while dynamic
  * entities pay only their own blocks' bucket replacement.
  *
  * The stub chain head is advanced so the server answers a `chunks`×
  * 50-block range (every block's content is a deterministic function of
  * its number — the amplified range is as real as the registered one),
  * and the full extract program runs once per 50-block chunk into ONE
  * shared store, exactly how an operator extends a production root.
  * Per chunk it records:
  *
  *  - `secs` — wall-clock of the whole chunk (fetch + derive + land);
  *  - `merged_dim_rows` — |accounts| + |skeletons| after the chunk: the
  *    rows the two mergeStatic sinks REWROTE this chunk (each merge
  *    rewrites its whole dimension through the atomic swap);
  *  - `appended_rows` — rows landed by the add-only upserts this chunk
  *    (blocks/deployments/… grow by the batch, never rewrite);
  *  - `dynamic_rows` — rows landed into dynamic buckets this chunk
  *    (per-block replacement: flat per chunk, by construction).
  *
  * The law under test: `dynamic_rows` and `appended_rows` stay flat as
  * the store grows, `merged_dim_rows` grows ~linearly with the covered
  * range — so per-chunk cost acquires a slowly-growing rewrite term
  * whose unit is the dimension's size. At 100 TB that term is why
  * merged dimensions (accounts ~2×10⁹ rows) get periodic compaction
  * windows rather than per-batch merges, while the dynamic stream never
  * needs one.
  *
  * Usage: `runMain graft.bench.ExtractRehearsal [chunks, default 16]`.
  */
object ExtractRehearsal {
  def main(args: Array[String]): Unit = {
    val chunks = args.headOption.map(_.toInt).getOrElse(16)
    val blocksPerChunk = 50L
    val from0 = 700L
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val outRoot = graft.Temps.dir("extract-rehearsal")
    graft.sources.RpcStub.setHead(from0 + chunks * blocksPerChunk)
    try {
      val decompiler = graft.etl.Extract.standInDecompiler()
      var prevDynamic = 0L
      var prevAppended = 0L
      val rows = (0 until chunks).map { c =>
        val from = from0 + c * blocksPerChunk
        val to = from + blocksPerChunk - 1
        val t0 = System.nanoTime()
        val counts = graft.etl.Extract.run(spark, graft.sources.RpcStub.endpoint,
          from, to, outRoot, decompiler = decompiler)
        val secs = (System.nanoTime() - t0) / 1e9
        val merged = counts("accounts") + counts("skeletons")
        val dynTotal = counts("transactions") + counts("transfers") + counts("logs")
        val appTotal = Seq("blocks", "deployments", "destructions", "functions",
          "events", "errors", "abi", "withdrawals").map(counts).sum
        val row = (c, merged, appTotal - prevAppended, dynTotal - prevDynamic, secs)
        prevDynamic = dynTotal; prevAppended = appTotal
        println(s"""{"family":"extract_rehearsal","chunk":$c,"from":$from,"to":$to,""" +
          s""""merged_dim_rows":${row._2},"appended_rows":${row._3},""" +
          s""""dynamic_rows":${row._4},"secs":${math.round(secs * 100) / 100.0}}""")
        row
      }
      println("\n| chunk | merged dim rows (rewritten) | appended rows | dynamic rows | secs |")
      println("|---|---|---|---|---|")
      rows.foreach { case (c, m, a, d, s) =>
        println(f"| $c%d | $m%d | $a%d | $d%d | $s%.2f |")
      }
    } finally {
      graft.sources.RpcStub.setHead(graft.sources.RpcStub.Head)
      spark.stop()
    }
  }
}
