package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Evm, Hex, Keccak, Sig}

/** Row-level decode transforms (SURVEY.md §2.3 P1-P8) over the real
  * entity schemas ([[graft.domain.Schemas]]). Pure DataFrame programs:
  * filters and projections stay declarative so Catalyst pushes them into
  * the scan; only the genuinely non-relational pieces (uint256 hex,
  * skeleton/keccak, CBOR) are UDFs on deterministic pure functions.
  */
object Decode {

  /** uint256 hex word (with or without 0x) → decimal string. Values
    * exceed Decimal(38,0) (2^256-1 > 10^77) so the faithful type is a
    * string, as in the reference (SURVEY §1.3). Native codegen
    * expression ([[graft.functions.EvmExprs]]), not a ScalaUDF. */
  def hexToDec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.EvmExprs.hexToDec(c)

  /** Skeleton hash of deployed bytecode: keccak-256 of
    * extract_skeleton(runtime-part-of(code)) — the reference's skeleton
    * identity (contract_deployment.rs:110-112 over skeleton.rs:8-23 and
    * metadata.rs:20-34). Native codegen expression. */
  def skeletonHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.EvmExprs.skeletonHash(c)

  /** Normalized skeleton bytecode itself (hex, no 0x). */
  val skeletonHex = udf { (codeHex: String) =>
    if (codeHex == null) null
    else {
      val code = Hex.decode(codeHex)
      val runtime = Evm.separateMetadata(code).map(_._1).getOrElse(code)
      Hex.encode(Evm.extractSkeleton(runtime))
    }
  }

  /** P7: CBOR metadata of deployed bytecode →
    * (solc_version, storage_protocol, storage_address, experimental).
    * Null struct when no marker / malformed (metadata.rs:98's
    * any-unknown-key ⇒ None). */
  val metadataOf = udf { (codeHex: String) =>
    if (codeHex == null) None
    else
      Evm.separateMetadata(Hex.decode(codeHex)).flatMap {
        case (_, meta) => Evm.analyzeMetadata(meta)
      }.map(m => (m.solcVersion.orNull, m.storageProtocol.orNull,
        m.storageHash.orNull, m.experimental.getOrElse(false)))
  }

  /** P2: creation traces → ContractDeployment rows
    * (contract_deployment.rs:49-95). `failed` here is the TRACE-level
    * error; tx-level propagation is [[Enrich.flagFailedCreations]]. */
  def deployments(traces: DataFrame): DataFrame =
    traces
      .filter(col("type") === "create" && col("address").isNotNull)
      .select(
        col("address").as("contract"),
        col("from").as("creator"),
        col("block_number"),
        col("tx_hash"),
        col("error").isNotNull.as("failed"),
        col("init").as("creation_bytecode"),
        col("code").as("deployed_bytecode"))
      .withColumn("skeleton_hash", skeletonHash(col("deployed_bytecode")))
      .withColumn("meta", metadataOf(col("deployed_bytecode")))
      .select(col("*"),
        col("meta._1").as("solc_version"),
        col("meta._2").as("storage_protocol"),
        col("meta._3").as("storage_address"),
        col("meta._4").as("experimental"))
      .drop("meta")

  /** P3: SELFDESTRUCT traces → ContractDestruction rows
    * (contract_destruction.rs:33-59). */
  def destructions(traces: DataFrame): DataFrame =
    traces
      .filter(col("type") === "suicide")
      .select(
        col("address").as("contract"),
        col("block_number"),
        col("tx_hash"),
        col("error").isNotNull.as("failed"),
        hexToDec(col("balance")).as("balance_left"),
        col("refund_address"))

  /** Last 20 bytes of a 0x-prefixed 32-byte topic word → 0x address. */
  private def topicToAddress(topic: Column): Column =
    concat(lit("0x"), substring(topic, 27, 40))

  /** P1: logs → TokenTransfer rows (logs.rs:45-113). Server-side topic0
    * filter (S3) becomes a pushed parquet filter; 3 topics = ERC-20
    * (value in data word), 4 topics = ERC-721 (token_id in topic_3),
    * any other arity dropped (logs.rs:52-58); malformed value words
    * dropped silently like the reference's decode failures. */
  def transfersFromLogs(logs: DataFrame): DataFrame = {
    val nTopics = lit(1) +
      when(col("topic_1").isNotNull, 1).otherwise(0) +
      when(col("topic_2").isNotNull, 1).otherwise(0) +
      when(col("topic_3").isNotNull, 1).otherwise(0)
    logs
      .filter(col("topic_0") === Sig.TransferTopic)
      .withColumn("n_topics", nTopics)
      .filter(col("n_topics").isin(3, 4))
      .withColumn("token_type",
        when(col("n_topics") === 4, "ERC721").otherwise("ERC20"))
      .filter( // malformed ERC-20 data word → drop row (logs.rs:75-97)
        col("token_type") === "ERC721" ||
          (col("data").isNotNull && length(col("data")) === 66))
      .select(
        col("address").as("contract"),
        topicToAddress(col("topic_1")).as("from"),
        topicToAddress(col("topic_2")).as("to"),
        col("token_type"),
        when(col("token_type") === "ERC20", hexToDec(col("data"))).as("value"),
        when(col("token_type") === "ERC721", hexToDec(col("topic_3"))).as("token_id"),
        col("block_number"),
        col("tx_hash"),
        col("log_index"))
  }

  /** P4 + P6: transaction projections — bytes4 selector when calldata is
    * at least 4 bytes (transaction.rs:59-63), `to` defaulted to the zero
    * address for contract creations (transaction.rs:38-43). */
  def decorateTransactions(txs: DataFrame): DataFrame =
    txs
      .withColumn("bytes4",
        when(length(col("input")) >= 10, substring(col("input"), 3, 8)))
      .withColumn("to", coalesce(col("to"), lit(Sig.ZeroAddress)))

  /** Block.withdrawals nested array → one row per withdrawal with the
    * block FK (block.rs:323-339's nested entity, relationally flattened;
    * amounts stay uint256-decimal strings). */
  def explodeWithdrawals(blocks: DataFrame): DataFrame =
    blocks
      .filter(col("withdrawals").isNotNull)
      .select(col("number").as("block_number"),
        explode(col("withdrawals")).as("w"))
      .select(
        col("block_number"),
        col("w.address").as("address"),
        col("w.amount").as("amount"),
        col("w.index").as("index"),
        col("w.validator_index").as("validator_index"))

  /** P8: only keep `removed` when true (reorg marker, log.rs:201-204). */
  def removedFlag(logs: DataFrame): DataFrame =
    logs.withColumn("removed", when(col("removed"), lit(true)))
}
