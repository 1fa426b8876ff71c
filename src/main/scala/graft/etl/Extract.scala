package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Rpc
import graft.sinks.Layout

/** The reference's `extract` subcommand end to end (main.rs:18-26,
  * extract.rs:84-289): fetch a block range over JSON-RPC, derive every
  * entity with the production decode/enrich stack, and land the
  * reference's static/dynamic layout (extract.rs:304-313) plus the
  * bulk-load schema artifact. This is the program a reference user
  * actually runs — everything else in the library is a piece of it.
  *
  * Scale shape: three paged fetches (bounded by `slots`, retrying
  * through transient failures), each materialized ONCE and fanned out
  * to its consumers; every derivation is a narrow transform or an
  * equi-join; the only wide operations are the Account-dimension
  * groupBy and the per-block stats aggregate.
  */
object Extract {

  def run(spark: SparkSession, endpoint: String, from: Long, to: Long,
      outRoot: String, slots: Int = 8): Map[String, Long] = {
    val blocks = Rpc.fetchBlocks(spark, endpoint, from, to, slots).localCheckpoint()
    val traces = Rpc.traceEntities(
      Rpc.fetchTraces(spark, endpoint, from, to, slots)).localCheckpoint()
    val logs = Rpc.fetchLogs(spark, endpoint, from, to, slots).localCheckpoint()

    val transactions = Decode.decorateTransactions(
      blocks.select(col("number").as("block_number"),
          explode(col("transactions")).as("t"))
        .select(col("block_number"), col("t.hash").as("hash"),
          col("t.from").as("from"), col("t.to").as("to"),
          col("t.input").as("input"),
          graft.functions.EvmExprs.hexToDec(col("t.value")).as("value"),
          Rpc.hexQtyToLong(col("t.gas")).as("gas"),
          Rpc.hexQtyToLong(col("t.gasPrice")).as("gas_price")))
      .localCheckpoint() // consumed by the sink, accounts, and block stats

    val deployments = Enrich.flagFailedCreations(
      Decode.deployments(traces), traces).localCheckpoint()
    val destructions = Decode.destructions(traces)
    val transfers = Decode.transfersFromLogs(logs)
    val withdrawals = Decode.explodeWithdrawals(blocks)

    // A4 discipline: skeletons dedup BEFORE anything expensive
    val skeletons = deployments
      .select(col("skeleton_hash"),
        Decode.skeletonHex(col("deployed_bytecode")).as("bytecode"))
      .where(col("skeleton_hash").isNotNull)
      .dropDuplicates("skeleton_hash")

    val accounts = Enrich.accounts(
      blocks, transactions.select(col("from"), col("to")),
      deployments, destructions, transfers, logs)

    val blockStats = Enrich.blockGasStats(
      blocks.select(col("number"), col("base_fee_wei").as("base_fee_per_gas"),
        col("ts"), col("gas_used"), col("gas_limit"), col("miner")),
      transactions.select(col("block_number"), col("gas_price")))

    // extract.rs:304-313's split: slowly-growing entity tables static,
    // block-keyed streams dynamic (replayable by bucket)
    val static = Map(
      "blocks" -> blockStats, "deployments" -> deployments,
      "destructions" -> destructions, "skeletons" -> skeletons,
      "accounts" -> accounts, "withdrawals" -> withdrawals)
    val dynamic = Map(
      "transactions" -> transactions, "transfers" -> transfers, "logs" -> logs)

    static.foreach { case (name, df) => Layout.writeStatic(df, outRoot, name) }
    dynamic.foreach { case (name, df) => Layout.writeDynamic(df, outRoot, name) }
    Layout.writeDgraphSchema(spark, outRoot)

    val counts =
      static.map { case (n, _) =>
        n -> spark.read.parquet(s"$outRoot/static/$n").count() } ++
        dynamic.map { case (n, _) =>
          n -> spark.read.parquet(s"$outRoot/dynamic/$n").count() }
    counts.toMap
  }

  /** CLI face: `runMain graft.etl.Extract [endpoint] [from] [to] [out]`
    * — defaults drive the local stub node over a small range. */
  def main(args: Array[String]): Unit = {
    val endpoint = args.lift(0).getOrElse(graft.sources.RpcStub.endpoint)
    val from = args.lift(1).map(_.toLong).getOrElse(700L)
    val to = args.lift(2).map(_.toLong).getOrElse(750L)
    val outRoot = args.lift(3).getOrElse(graft.Temps.dir("extract-out"))
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try {
      val counts = run(spark, endpoint, from, to, outRoot)
      println(s"EXTRACT $outRoot " +
        counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
    } finally spark.stop()
  }
}
