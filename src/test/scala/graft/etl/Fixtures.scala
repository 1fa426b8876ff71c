package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.domain.Schemas
import graft.functions.{Keccak, Sig}

/** FIXTURES.md §B synthetic entity tables — minimal rows covering every
  * decode/enrich branch, with hand-computable expected values. */
object Fixtures {

  def addr(n: Int): String = "0x" + f"$n%040x"
  def hash(n: Int): String = "0x" + f"$n%064x"
  def word(n: Int): String = "0x" + f"$n%064x"

  /** B3 traces. Scenarios (FIXTURES.md): (a) successful create in tx1;
    * (b) J1 propagation in tx2 — child [3,0] (a create) under failed
    * [3], plus sibling [4] unaffected; (c) suicide in tx3; (d) reward
    * trace dropped everywhere; (e) create with direct error in tx4. */
  def traces(spark: SparkSession): DataFrame = {
    val push1 = "6001600255" // PUSH1 01 PUSH1 02 SSTORE — tiny runtime code
    val rows = Seq(
      // (block, tx, trace_address, type, error, from, init, address, code, balance, refund)
      Row(100L, hash(1), Seq(), "create", null, addr(10), "0x60016002", addr(20), "0x" + push1, null, null),
      Row(100L, hash(2), Seq(3), "call", "Reverted", addr(11), null, null, null, null, null),
      Row(100L, hash(2), Seq(3, 0), "create", null, addr(11), "0x6001", addr(21), "0x" + push1, null, null),
      Row(100L, hash(2), Seq(4), "call", null, addr(11), null, null, null, null, null),
      Row(101L, hash(3), Seq(), "suicide", null, null, null, addr(20), null, "0x0de0b6b3a7640000", addr(12)),
      Row(101L, hash(3), Seq(9), "reward", null, null, null, null, null, null, null),
      Row(101L, hash(4), Seq(), "create", "OutOfGas", addr(13), "0x6001", addr(22), "0x" + push1, null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.trace)
  }

  /** B4 logs: ERC-20 transfer (3 topics, value=255 in data), ERC-721
    * (4 topics, token_id=7), wrong-arity Transfer (2 topics → drop),
    * non-Transfer log, removed reorg log. */
  def logs(spark: SparkSession): DataFrame = {
    val t = Sig.TransferTopic
    val rows = Seq(
      Row(100L, hash(1), 0L, 0L, addr(30), t, word(1), word(2), null, word(255), false),
      Row(100L, hash(1), 0L, 1L, addr(31), t, word(3), word(4), word(7), "0x", false),
      Row(100L, hash(2), 1L, 2L, addr(32), t, word(5), null, null, word(9), false),
      Row(100L, hash(2), 1L, 3L, addr(33), hash(99), word(1), null, null, "0x", false),
      Row(101L, hash(3), 0L, 0L, addr(30), t, word(1), word(2), null, word(8), true))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.log)
  }

  /** B2 transactions: normal call, contract creation (null to), short
    * input, type-2 tx (null gas_price), huge value string. */
  def transactions(spark: SparkSession): DataFrame = {
    // Schemas.transaction column order: hash, block_number, from, to, value,
    // gas, gas_price, input, bytes4, max_fee, max_priority, nonce, r, s, v
    val rows2 = Seq(
      Row(hash(1), 100L, addr(10), addr(20), "1000", 21000L, 50000000000L,
        "0xa9059cbb" + "00" * 64, null, 40000000000L, 1000000000L, 1L, "0xr1", "0xs1", "0x1b"),
      Row(hash(2), 100L, addr(11), null,
        "115792089237316195423570985008687907853269984665640564039457584007913129639935",
        100000L, 30000000000L, "0x60", null, null, null, 2L, "0xr2", "0xs2", "0x1c"),
      Row(hash(3), 101L, addr(12), addr(21), "0", 21000L, null,
        "0x", null, 40000000000L, 2000000000L, 3L, "0xr3", "0xs3", "0x1b"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows2), Schemas.transaction)
  }

  /** B1 blocks: one with txs, one empty (A1 edge case). */
  def blocks(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("number", LongType, nullable = false),
      StructField("datetime", TimestampType),
      StructField("miner", StringType),
      StructField("gas_limit", LongType),
      StructField("gas_used", LongType),
      StructField("base_fee_per_gas", DoubleType),
      StructField("size", LongType)))
    val ts = java.sql.Timestamp.valueOf("2023-01-01 00:00:00")
    val rows = Seq(
      Row(100L, ts, addr(40), 30000000L, 21000L, 15000000000.0, 5000L),
      Row(101L, ts, addr(41), 30000000L, 0L, null, 500L),
      Row(102L, ts, addr(40), 30000000L, 0L, 12000000000.0, 500L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  /** B5 ABI rows: full ERC-20 (6/6), full ERC-721 (9/9), an unresolved
    * function, an Event_<64hex>, a duplicate signature across skeletons. */
  def abi(spark: SparkSession): DataFrame = {
    def in(types: String*) = types.map(t => Row(null, t))
    def f(sk: String, name: String, types: Seq[String], outs: Seq[String] = Nil) =
      Row(sk, "function", name, types.map(t => Row(null, t)), outs.map(t => Row(null, t)), "nonpayable")
    val erc20 = Seq(
      f("sk20", "totalSupply", Nil, Seq("uint256")),
      f("sk20", "balanceOf", Seq("address"), Seq("uint256")),
      f("sk20", "transfer", Seq("address", "uint256"), Seq("bool")),
      f("sk20", "transferFrom", Seq("address", "address", "uint256"), Seq("bool")),
      f("sk20", "approve", Seq("address", "uint256"), Seq("bool")),
      f("sk20", "allowance", Seq("address", "address"), Seq("uint256")))
    val erc721 = Seq(
      f("sk721", "balanceOf", Seq("address"), Seq("uint256")),
      f("sk721", "ownerOf", Seq("uint256"), Seq("address")),
      f("sk721", "safeTransferFrom", Seq("address", "address", "uint256", "bytes")),
      f("sk721", "safeTransferFrom", Seq("address", "address", "uint256")),
      f("sk721", "transferFrom", Seq("address", "address", "uint256")),
      f("sk721", "approve", Seq("address", "uint256")),
      f("sk721", "setApprovalForAll", Seq("address", "bool")),
      f("sk721", "getApproved", Seq("uint256"), Seq("address")),
      f("sk721", "isApprovedForAll", Seq("address", "address"), Seq("bool")))
    val misc = Seq(
      f("skX", "transfer", Seq("address", "uint256")), // dup sig across skeletons
      f("skX", "Unresolved_f8b2cb4f", Nil),
      Row("skX", "event",
        "Event_" + "c0d559150c15862e872a031a8e11f466df4b16d14e736187f2e7fb162060f9d0",
        Seq.empty[Row], Seq.empty[Row], null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(erc20 ++ erc721 ++ misc), Schemas.abiEntry)
  }

  /** B6 lifetimes scenarios (FIXTURES.md): c1 never destroyed; c2
    * destroyed once (lifetime 10 blocks); c3 destroyed 3×; c4
    * deploy+destroy same block different tx; c5 same tx (zero
    * lifetime). */
  def deployments(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("contract", StringType),
      StructField("tx_hash", StringType),
      StructField("block_number", LongType),
      StructField("block_datetime", TimestampType),
      StructField("failed", BooleanType),
      StructField("skeleton_hash", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Row(addr(1), hash(11), 100L, ts("2023-01-01 00:00:00"), false, "sk20"),
      Row(addr(2), hash(12), 100L, ts("2023-01-01 00:00:00"), false, "sk20"),
      Row(addr(3), hash(13), 100L, ts("2023-01-01 00:00:00"), false, "sk721"),
      Row(addr(4), hash(14), 105L, ts("2023-01-01 01:00:00"), false, "skX"),
      Row(addr(5), hash(15), 106L, ts("2023-01-01 02:00:00"), false, "skX"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  def destructions2(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("contract", StringType),
      StructField("tx_hash", StringType),
      StructField("block_number", LongType),
      StructField("block_datetime", TimestampType),
      StructField("failed", BooleanType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Row(addr(2), hash(21), 110L, ts("2023-01-01 02:00:00"), false),
      Row(addr(3), hash(22), 101L, ts("2023-01-01 00:10:00"), false),
      Row(addr(3), hash(23), 102L, ts("2023-01-01 00:20:00"), false),
      Row(addr(3), hash(24), 103L, ts("2023-01-01 00:30:00"), false),
      Row(addr(4), hash(25), 105L, ts("2023-01-01 01:00:00"), false), // same block, diff tx
      Row(addr(5), hash(15), 106L, ts("2023-01-01 02:00:00"), false)) // same tx
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }
}
