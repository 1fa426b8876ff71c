package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Sig

/** Enrichment joins and block-level aggregates (SURVEY.md §2.4 J1-J4,
  * §2.5 A1-A4, §2.7 account dimension). All equi-joins on natural keys —
  * broadcastable when one side is a small dimension; the J1 prefix theta
  * join stays an equi-join on tx_hash with the prefix test as a residual
  * condition, so it shuffles on tx_hash only (bounded fan-out: traces of
  * one tx).
  */
object Enrich {

  /** J1: trace error propagation (traces.rs:6-34). A trace is failed
    * when ANY errored trace of the same tx has a trace_address that is a
    * prefix of its own — an errored trace is its own prefix, so errored
    * traces stay failed. Adds a `failed` boolean to every trace row. */
  def propagateTraceErrors(traces: DataFrame): DataFrame = {
    val errs = traces.filter(col("error").isNotNull)
      .select(col("tx_hash").as("p_tx"), col("trace_address").as("p_addr"))
    val failedKeys = traces
      .join(errs,
        col("tx_hash") === col("p_tx") &&
          slice(col("trace_address"), lit(1), size(col("p_addr"))) === col("p_addr"),
        "left_semi")
      .select(col("tx_hash"), col("trace_address"))
      .distinct()
      .withColumn("failed", lit(true))
    traces.join(failedKeys, Seq("tx_hash", "trace_address"), "left")
      .withColumn("failed", coalesce(col("failed"), lit(false)))
  }

  /** J2: creation rows flagged failed when their tx contains ANY errored
    * trace (trace.rs:106-124). The failed-tx set is tiny → broadcast. */
  def flagFailedCreations(deployments: DataFrame, traces: DataFrame): DataFrame = {
    val failedTx = traces.filter(col("error").isNotNull)
      .select(col("tx_hash")).distinct()
      .withColumn("tx_failed", lit(true))
    deployments.join(broadcast(failedTx), Seq("tx_hash"), "left")
      .withColumn("failed", col("failed") || coalesce(col("tx_failed"), lit(false)))
      .drop("tx_failed")
  }

  /** J3: deployment → skeleton natural-key equi-join
    * (contract_deployment.rs:374-380). */
  def linkSkeletons(deployments: DataFrame, skeletons: DataFrame): DataFrame =
    deployments.join(skeletons, Seq("skeleton_hash"), "left")

  /** §2.7/J4: the Account dimension — UNION DISTINCT over every
    * address-bearing column; contracts (deployed or log-emitting) get
    * is_contract=true (contract_deployment.rs:350-355, log.rs:150-156).
    * One shuffle (the final groupBy); each input is a pruned projection.
    * The reference DDL's `Account.tags` (schema.graphql:3) is dead
    * schema — nothing in the reference writes or reads it (SURVEY
    * §2.7 has the resolution) — so the dimension deliberately omits
    * it rather than carrying an always-null column. */
  def accounts(
      blocks: DataFrame,
      transactions: DataFrame,
      deployments: DataFrame,
      destructions: DataFrame,
      transfers: DataFrame,
      logs: DataFrame): DataFrame = {
    def addr(df: DataFrame, c: String, isContract: Boolean = false): DataFrame =
      df.select(col(c).as("address"), lit(isContract).as("is_contract"))
        .filter(col("address").isNotNull)
    addr(blocks, "miner")
      .unionByName(addr(transactions, "from"))
      .unionByName(addr(transactions, "to"))
      .unionByName(addr(deployments, "contract", isContract = true))
      .unionByName(addr(deployments, "creator"))
      .unionByName(addr(destructions, "contract", isContract = true))
      .unionByName(addr(destructions, "refund_address"))
      .unionByName(addr(transfers, "from"))
      .unionByName(addr(transfers, "to"))
      .unionByName(addr(transfers, "contract", isContract = true))
      .unionByName(addr(logs, "address", isContract = true))
      .groupBy(col("address"))
      .agg(max(col("is_contract")).as("is_contract"))
  }

  /** A1/A2: per-block gas-price stats in Gwei — min/max/avg/POPULATION
    * stddev (block.rs:34-64, ÷n at :57-59) + tx_count. Deviation from
    * the reference documented in SURVEY §7.5-4: tx-less or all-type-2
    * blocks yield NULL stats (the reference yields MAX/0/NaN/NaN).
    *
    * Stats accumulate as exact decimal power sums over wei (F13
    * discipline) with a single double conversion at the end, so the
    * result is aggregation-order-independent — bit-identical on any
    * partitioning, and reproducible by an external oracle. Variance is
    * clamped at 0 before the sqrt (the float subtraction can dip a few
    * ulps negative when all prices in a block are equal). */
  def blockGasStats(blocks: DataFrame, transactions: DataFrame): DataFrame = {
    val wei = col("gas_price").cast("decimal(38,0)")
    val n = count(when(col("gas_price").isNotNull, 1))
    val s1 = sum(wei).cast("double")
    val s2 = sum(wei * wei).cast("double")
    val perBlock = transactions
      .groupBy(col("block_number"))
      .agg(
        count(lit(1)).as("tx_count"),
        (min(wei).cast("double") / 1e9).as("gas_price_min"),
        (max(wei).cast("double") / 1e9).as("gas_price_max"),
        (s1 / n / 1e9).as("gas_price_avg"),
        (sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), lit(0d))) / 1e9)
          .as("gas_price_std_dev"))
    blocks.join(perBlock, col("number") === col("block_number"), "left")
      .drop("block_number")
      .withColumn("tx_count", coalesce(col("tx_count"), lit(0L)))
      .withColumn("base_fee_per_gas", col("base_fee_per_gas") / 1e9)
  }

  /** A3/K3: global first-seen-wins dedup of ABI signatures
    * (writer.rs:56-58, 163-191): one row per (kind, signature hash). */
  def dedupSignatures(abi: DataFrame): DataFrame = {
    // kind rides into the hash: the embedded-hash short-circuit is
    // per-kind (Event_ names embed only on events, Error_ only on
    // errors — see Sig), so the same name can legitimately hash
    // differently across kinds
    val sigHash = udf { (name: String, types: Seq[String], kind: String) =>
      Sig.signatureHash(name, if (types == null) Seq.empty else types, kind)
    }
    val bytes4 = udf { (name: String, types: Seq[String]) =>
      Sig.bytes4(name, if (types == null) Seq.empty else types)
    }
    val inputTypes = transform(col("inputs"), f => f.getField("internalType"))
    abi
      .withColumn("input_types", inputTypes)
      .withColumn("signature", sigHash(col("name"), col("input_types"), col("kind")))
      .withColumn("bytes4", bytes4(col("name"), col("input_types")))
      .withColumn("inputs_str", array_join(col("input_types"), ","))
      .withColumn("outputs_str",
        array_join(transform(col("outputs"), f => f.getField("internalType")), ","))
      .dropDuplicates("kind", "signature")
      .select("kind", "signature", "bytes4", "name", "inputs_str", "outputs_str")
  }
}
