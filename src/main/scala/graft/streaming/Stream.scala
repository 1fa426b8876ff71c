package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `stream` subcommand (main.rs:28-56,
  * stream.rs:339-372 `run_stream_extraction`) as a CLI over
  * [[Incremental.followHeadEntities]]: follow the node's head and keep
  * the per-block entity tables replaced — contract deployments and
  * destructions always (stream.rs:70-263's always-on legs), plus
  * transactions / token transfers / logs behind the reference's
  * `--include-tx` / `--include-tokens` / `--include-logs` flags.
  * `--no-sync` skips the catch-up and indexes only blocks past the
  * head at launch (main.rs:49-51); the default behavior is
  * catch-up-then-live from the sink's resume point in one code path.
  *
  * The reference streams into Dgraph; we stream into the same
  * static/dynamic parquet layout `extract` lands (SURVEY S8: the
  * landed layout is the store), so a live follower and a batch
  * backfill produce interchangeable tables.
  */
object Stream {

  /** The per-gap derive map for the configured entity set. */
  def derivations(includeTx: Boolean, includeTokens: Boolean,
      includeLogs: Boolean): Seq[(String, Incremental.Gap => DataFrame)] = {
    val always: Seq[(String, Incremental.Gap => DataFrame)] = Seq(
      "blocks" -> (g => g.blocks.select(col("block_number"), col("ts"),
        col("gas_used"), col("gas_limit"), col("base_fee_wei"),
        col("miner"), col("difficulty"), col("size"),
        size(col("transactions")).cast("long").as("tx_count"))),
      "deployments" -> (g => graft.etl.Decode.deployments(g.traces)),
      "destructions" -> (g => graft.etl.Decode.destructions(g.traces)))
    val tx: Seq[(String, Incremental.Gap => DataFrame)] =
      if (!includeTx) Nil
      else Seq("transactions" -> (g => g.blocks
        .select(col("block_number"), explode(col("transactions")).as("t"))
        .select(col("block_number"), col("t.hash").as("hash"),
          col("t.from").as("from"), col("t.to").as("to"),
          graft.functions.EvmExprs.hexToDec(col("t.value")).as("value"),
          graft.sources.Rpc.hexQtyToLong(col("t.gas")).as("gas"),
          graft.sources.Rpc.hexQtyToLong(col("t.gasPrice")).as("gas_price"),
          col("t.input").as("input"))))
    val tokens: Seq[(String, Incremental.Gap => DataFrame)] =
      if (!includeTokens) Nil
      else Seq("transfers" -> (g => graft.etl.Decode.transfersFromLogs(g.logs)))
    val logs: Seq[(String, Incremental.Gap => DataFrame)] =
      if (!includeLogs) Nil
      else Seq("logs" -> (g => g.logs))
    always ++ tx ++ tokens ++ logs
  }

  /** CLI: `runMain graft.streaming.Stream [--endpoint url]
    * [--output-path dir] [--include-tx] [--include-tokens]
    * [--include-logs] [--no-sync] [--num-jobs n] [--from-block b]
    * [--until-head]`. `--until-head` stops at the indexed==head
    * fixpoint instead of following forever (the testable face of a
    * process the reference runs until killed). */
  def main(args: Array[String]): Unit = {
    def flagVal(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    def flag(name: String): Boolean = args.contains(name)
    val endpoint = flagVal("--endpoint").getOrElse(graft.sources.RpcStub.endpoint)
    val outRoot = flagVal("--output-path").getOrElse(graft.Temps.dir("stream-out"))
    val slots = flagVal("--num-jobs").map(_.toInt).getOrElse(8)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try {
      val head0 = graft.sources.Rpc.blockNumber(endpoint)
      // --no-sync: only blocks that arrive after launch (main.rs:49-51);
      // otherwise catch up from --from-block (or the sink's own resume
      // point when it already has data)
      val startBlock =
        if (flag("--no-sync")) head0 + 1
        else flagVal("--from-block").map(_.toLong).getOrElse(head0 - 10)
      val derive = derivations(flag("--include-tx"),
        flag("--include-tokens"), flag("--include-logs"))
      val q = Incremental.followHeadEntities(spark, endpoint, outRoot,
        graft.Temps.dir("stream-ckpt"), startBlock, derive, slots)
      if (flag("--until-head")) {
        val names = derive.map(_._1)
        val deadline = System.nanoTime() + 300L * 1000000000L
        def caughtUp() = names.forall(e =>
          Incremental.maxIndexedBlock(spark, outRoot, e)
            .exists(_ >= graft.sources.Rpc.blockNumber(endpoint)))
        while (q.exception.isEmpty && !caughtUp() && System.nanoTime() < deadline)
          Thread.sleep(200)
        q.exception.foreach(throw _)
        q.stop()
        val counts = derive.map { case (e, _) =>
          e -> spark.read.parquet(s"$outRoot/dynamic/$e").count() }
        println(s"STREAM $outRoot " +
          counts.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
      } else q.awaitTermination()
    } finally spark.stop()
  }
}
