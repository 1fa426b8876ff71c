package graft

import org.apache.spark.sql.functions._
import graft.etl.{Decode, Enrich, Fixtures}
import graft.analytics.{Lifetimes, Similarity}
import graft.sinks.Layout

/** End-to-end consumer of the entity pipeline: raw traces/logs/txs/blocks
  * → decode → enrich → analytics → partitioned sink → read back. The
  * runnable surface for the domain ETL layer
  * (`sbt "Test/runMain graft.EtlDemo"`). */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val out = graft.Temps.dir("graft-etl-demo")

    val traces = Fixtures.traces(spark)
    val logs = Fixtures.logs(spark)
    val txs = Decode.decorateTransactions(Fixtures.transactions(spark))
    val blocks = Fixtures.blocks(spark)

    val withErrors = Enrich.propagateTraceErrors(traces)
    val deployments = Enrich.flagFailedCreations(Decode.deployments(traces), traces)
    val destructions = Decode.destructions(traces)
    val transfers = Decode.transfersFromLogs(logs)
    val accounts = Enrich.accounts(blocks, txs, deployments, destructions, transfers, logs)
    val blockStats = Enrich.blockGasStats(blocks, txs)
    val signatures = Enrich.dedupSignatures(Fixtures.abi(spark))

    Layout.writeStatic(deployments, out, "deployments")
    Layout.writeStatic(accounts, out, "accounts")
    Layout.writeDynamic(transfers, out, "transfers")
    Layout.writeDynamic(Decode.removedFlag(logs), out, "logs")

    val lives = Lifetimes.contractLives(
      Fixtures.deployments(spark), Fixtures.destructions2(spark))
    val erc20 = Similarity.erc20Compliancy(Fixtures.abi(spark))

    println("=== graft ETL demo ===")
    Seq(
      "traces(failed)" -> withErrors.filter(col("failed")).count(),
      "deployments" -> spark.read.parquet(s"$out/static/deployments").count(),
      "destructions" -> destructions.count(),
      "transfers(read-back)" -> spark.read.parquet(s"$out/dynamic/transfers").count(),
      "accounts" -> spark.read.parquet(s"$out/static/accounts").count(),
      "block_stats" -> blockStats.count(),
      "signatures" -> signatures.count(),
      "contract_lives" -> lives.count(),
      "erc20_scored" -> erc20.count()
    ).foreach { case (k, v) => println(f"$k%-22s $v") }
    println("RQ4: " + Lifetimes.rq4LifetimeStats(lives).head())
    println("DEMO OK")
    spark.stop()
  }
}
