package graft.domain

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's 11-entity property-graph model
  * (SURVEY.md §1.2/§1.3; authoritative source
  * /root/reference/dgraph/schema.graphql). Natural keys replace Dgraph
  * uids; uint256 money columns stay decimal STRINGS (2^256-1 exceeds
  * Decimal(38,0)); gas is LONG; gas *prices* in block stats are DOUBLE
  * Gwei; datetimes are TIMESTAMP. Nothing is ever schema-inferred.
  */
object Schemas {

  val withdrawal: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("amount", StringType), // uint256 decimal string
    StructField("index", LongType),
    StructField("validator_index", LongType)))

  val block: StructType = StructType(Seq(
    StructField("number", LongType, nullable = false),
    StructField("datetime", TimestampType),
    StructField("miner", StringType),
    StructField("difficulty", StringType), // uint256 decimal string
    StructField("tx_count", LongType),
    StructField("gas_price_min", DoubleType), // Gwei
    StructField("gas_price_max", DoubleType),
    StructField("gas_price_avg", DoubleType),
    StructField("gas_price_std_dev", DoubleType),
    StructField("gas_limit", LongType),
    StructField("gas_used", LongType),
    StructField("base_fee_per_gas", DoubleType), // Gwei
    StructField("size", LongType),
    StructField("withdrawals", ArrayType(withdrawal))))

  val transaction: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("block_number", LongType),
    StructField("from", StringType),
    StructField("to", StringType), // zero-address when contract creation
    StructField("value", StringType), // uint256 decimal string
    StructField("gas", LongType),
    StructField("gas_price", LongType), // wei
    StructField("input", StringType),
    StructField("bytes4", StringType),
    StructField("max_fee_per_gas", LongType),
    StructField("max_priority_fee_per_gas", LongType),
    StructField("nonce", LongType),
    StructField("r", StringType),
    StructField("s", StringType),
    StructField("v", StringType)))

  /** Raw execution trace rows (input to decoding; modeled on
    * trace_block output, extraction/traces.rs). */
  val trace: StructType = StructType(Seq(
    StructField("block_number", LongType),
    StructField("tx_hash", StringType),
    StructField("trace_address", ArrayType(IntegerType, containsNull = false)),
    StructField("type", StringType), // call | create | suicide | reward
    StructField("error", StringType),
    StructField("from", StringType),
    StructField("init", StringType), // creation bytecode
    StructField("address", StringType), // created/destroyed contract
    StructField("code", StringType), // deployed bytecode
    StructField("balance", StringType), // uint256 decimal string
    StructField("refund_address", StringType)))

  val log: StructType = StructType(Seq(
    StructField("block_number", LongType),
    StructField("tx_hash", StringType),
    StructField("tx_index", LongType),
    StructField("log_index", LongType),
    StructField("address", StringType),
    StructField("topic_0", StringType),
    StructField("topic_1", StringType),
    StructField("topic_2", StringType),
    StructField("topic_3", StringType),
    StructField("data", StringType),
    StructField("removed", BooleanType)))

  val contractDeployment: StructType = StructType(Seq(
    StructField("contract", StringType),
    StructField("creator", StringType),
    StructField("block_number", LongType),
    StructField("tx_hash", StringType),
    StructField("failed", BooleanType),
    StructField("creation_bytecode", StringType),
    StructField("deployed_bytecode", StringType),
    StructField("skeleton_hash", StringType),
    StructField("solc_version", StringType),
    StructField("storage_protocol", StringType),
    StructField("storage_address", StringType),
    StructField("experimental", BooleanType),
    StructField("name", StringType),
    StructField("verified_source", BooleanType),
    // the verified source TEXT itself when the sanctuary has it
    // (contract_deployment.rs:319-327 serializes the code, not just
    // the flag); null for unverified contracts
    StructField("verified_source_code", StringType)))

  val contractDestruction: StructType = StructType(Seq(
    StructField("contract", StringType),
    StructField("block_number", LongType),
    StructField("tx_hash", StringType),
    StructField("failed", BooleanType),
    StructField("balance_left", StringType), // uint256 decimal string
    StructField("refund_address", StringType)))

  val skeleton: StructType = StructType(Seq(
    StructField("skeleton_hash", StringType, nullable = false),
    StructField("bytecode", StringType),
    StructField("failed_decompilation", BooleanType),
    StructField("erc20_compliancy", IntegerType), // 0..6
    StructField("erc721_compliancy", IntegerType))) // 0..9

  /** The global Function entity (function.rs:49-82's Dgraph shape,
    * deduped by signature across all skeletons — writer.rs:56-58):
    * `signature` is the keccak of the canonical `name(types)` string,
    * `bytes4` its first 4 bytes (or the selector embedded in an
    * `Unresolved_xxxxxxxx` name), inputs/outputs comma-joined type
    * lists. */
  val functionEntity: StructType = StructType(Seq(
    StructField("signature", StringType, nullable = false),
    StructField("bytes4", StringType),
    StructField("name", StringType),
    StructField("inputs", StringType),
    StructField("outputs", StringType)))

  /** Event entity (event.rs:40-58; `Event_<64hex>` names embed their
    * own topic hash). */
  val eventEntity: StructType = StructType(Seq(
    StructField("signature", StringType, nullable = false),
    StructField("name", StringType),
    StructField("inputs", StringType)))

  /** Error entity (error.rs:40-58). */
  val errorEntity: StructType = StructType(Seq(
    StructField("signature", StringType, nullable = false),
    StructField("name", StringType),
    StructField("inputs", StringType)))

  val abiEntry: StructType = StructType(Seq(
    StructField("skeleton_hash", StringType),
    StructField("kind", StringType), // function | event | error
    StructField("name", StringType),
    StructField("inputs", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("internalType", StringType))))),
    StructField("outputs", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("internalType", StringType))))),
    StructField("state_mutability", StringType)))

  val tokenTransfer: StructType = StructType(Seq(
    StructField("contract", StringType),
    StructField("from", StringType),
    StructField("to", StringType),
    StructField("token_type", StringType), // ERC20 | ERC721
    StructField("value", StringType), // uint256 decimal string (ERC20)
    StructField("token_id", StringType), // uint256 decimal string (ERC721)
    StructField("block_number", LongType),
    StructField("tx_hash", StringType),
    StructField("log_index", LongType)))

  val account: StructType = StructType(Seq(
    StructField("address", StringType, nullable = false),
    StructField("is_contract", BooleanType)))

  /** The entity catalog by bulk-load name (writer.rs's shard-file
    * prefixes). */
  val entities: Seq[(String, StructType)] = Seq(
    "accounts" -> account, "blocks" -> block, "transactions" -> transaction,
    "deployments" -> contractDeployment, "destructions" -> contractDestruction,
    "skeletons" -> skeleton, "transfers" -> tokenTransfer, "logs" -> log,
    "traces" -> trace, "withdrawals" -> withdrawal, "abi" -> abiEntry,
    "functions" -> functionEntity, "events" -> eventEntity,
    "errors" -> errorEntity)

  /** A Dgraph-style schema GENERATED from the StructTypes above (the
    * reference ships a hand-written dgraph/contracts.schema; deriving
    * ours mechanically keeps the artifact in sync with the code —
    * predicate lines `entity.field: type .`, non-nullable fields
    * carrying the upsert `@index` the reference's natural-key upserts
    * rely on, nested structs as `[uid]` edges). */
  def dgraphSchema: String = {
    def dgraphType(dt: DataType): String = dt match {
      case LongType | IntegerType => "int"
      case DoubleType | FloatType => "float"
      case BooleanType => "bool"
      case TimestampType => "dateTime"
      case ArrayType(_: StructType, _) => "[uid]"
      case ArrayType(e, _) => s"[${dgraphType(e)}]"
      case _ => "string"
    }
    val lines = for {
      (entity, st) <- entities
      f <- st.fields
    } yield {
      val t = dgraphType(f.dataType)
      val idx =
        if (!f.nullable && (t == "int" || t == "string"))
          s" @index(${if (t == "int") "int" else "hash"}) @upsert"
        else ""
      s"$entity.${f.name}: $t$idx ."
    }
    lines.mkString("\n") + "\n"
  }
}
