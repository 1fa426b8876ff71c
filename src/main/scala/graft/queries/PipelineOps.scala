package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Decode, Enrich}
import graft.functions.Sig
import Tables._

/** The reference's composed `extract` program (extract.rs:84-289) driven
  * END TO END over the real entity schemas ([[graft.domain.Schemas]])
  * and gated by the DuckDB oracle: raw traces/logs/blocks/transactions
  * are synthesized DETERMINISTICALLY from the driver's parquet tables
  * inside each query (same trick as q40 — inputs stay the driver's
  * files; the oracle synthesizes identical shapes in SQL), then the
  * production functions [[Decode]]/[[Enrich]] run unmodified.
  *
  * Bytecode is one of two PINNED constants — a fixed runtime prefix plus
  * the reference's own golden CBOR trailers (the q64 payloads) — so the
  * keccak skeleton hash and the CBOR metadata decode are pinned strings
  * the oracle states verbatim, while the real UDF/native-expression
  * stack computes them from bytes on the Spark side.
  */
object PipelineOps {

  /** 64-char zero-padded decimal word — the synthetic stand-in for hex
    * words/addresses; slicing arithmetic matches SQL lpad. */
  private def word(c: Column): Column = lpad(c.cast("string"), 64, "0")
  private def wordSql(e: String): String = s"lpad(CAST($e AS VARCHAR), 64, '0')"

  // pinned bytecode fixtures, shared with the stub RPC node (q103)
  import graft.domain.Golden.{CodeBzzr0, SkelHashBzzr0, StorageHashBzzr0,
    CodeIpfs, SkelHashIpfs, StorageHashIpfs}

  /** Deterministic trace rows in the full [[graft.domain.Schemas.trace]]
    * shape: one trace per (order, linenumber) — linenumber 1 is the
    * create, 7 the SELFDESTRUCT, the rest plain calls; returnflag 'R'
    * anywhere in the group marks the trace errored. The synthetic
    * lineitem has duplicate (orderkey, linenumber) pairs, so the groupBy
    * is the dedup. */
  private def entityTraces(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(
        max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("err"),
        min(col("l_suppkey")).as("skey"),
        min(col("l_partkey")).as("pkey"))
      .select(
        (col("l_orderkey") % 997L).as("block_number"),
        col("l_orderkey").cast("string").as("tx_hash"),
        array((col("l_linenumber") - 1).cast("int")).as("trace_address"),
        when(col("l_linenumber") === 1, "create")
          .when(col("l_linenumber") === 7, "suicide")
          .otherwise("call").as("type"),
        when(col("err") === 1, "Reverted").as("error"),
        word(col("skey")).as("from"),
        when(col("l_linenumber") === 1, "6080").as("init"),
        when(col("l_linenumber").isin(1, 7), word(col("skey") + 1)).as("address"),
        when(col("l_linenumber") === 1,
          when(col("l_orderkey") % 2 === 0, CodeBzzr0).otherwise(CodeIpfs)).as("code"),
        when(col("l_linenumber") === 7, lower(hex(col("pkey")))).as("balance"),
        when(col("l_linenumber") === 7, word(col("pkey"))).as("refund_address"))

  private val baseSql =
    """base AS (
      |  SELECT l_orderkey, l_linenumber,
      |         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS err,
      |         min(l_suppkey) AS skey,
      |         min(l_partkey) AS pkey
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** Deterministic log rows in the [[graft.domain.Schemas.log]] shape:
    * clicks are 3-topic ERC-20 transfers (value-cents in the data word),
    * purchases 4-topic ERC-721 (props.k in topic_3), everything else a
    * non-Transfer topic. Hex words are built with to_hex on both sides
    * so the decode arithmetic round-trips exactly. */
  private def entityLogs(s: SparkSession, d: String): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("bigint")
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    def hexWord(c: Column): Column = concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
    events(s, d).select(
      (col("event_id") % 997L).as("block_number"),
      concat(lit("t"), col("event_id")).as("tx_hash"),
      lit(0L).as("tx_index"),
      col("event_id").as("log_index"),
      word(col("user_id") + 7777777L).as("address"),
      when(col("event_type").isin("click", "purchase"), Sig.TransferTopic)
        .otherwise("0xother").as("topic_0"),
      hexWord(col("user_id")).as("topic_1"),
      hexWord(col("user_id") + 7).as("topic_2"),
      when(col("event_type") === "purchase", hexWord(k)).as("topic_3"),
      when(col("event_type") === "click", hexWord(cents)).as("data"),
      lit(false).as("removed"))
  }

  def defs: Map[String, Q] = Map(
    // extract.rs:84-289 leg 1: traces → Decode.deployments (P2: skeleton
    // hash + CBOR metadata over real bytecode) → Enrich.flagFailedCreations
    // (J2: tx-level error propagation onto the creation rows).
    "q87_pipeline_deployments" -> Q(
      (s, d) => {
        val t = entityTraces(s, d)
        Enrich.flagFailedCreations(Decode.deployments(t), t)
          .select(col("tx_hash"), col("contract"), col("creator"),
            col("block_number"), col("failed"), col("skeleton_hash"),
            col("solc_version"), col("storage_protocol"),
            col("storage_address"), col("experimental"))
      },
      Some(s"""WITH $baseSql,
              |txerr AS (SELECT l_orderkey, max(err) AS tx_err FROM base GROUP BY 1)
              |SELECT CAST(b.l_orderkey AS VARCHAR) AS tx_hash,
              |  ${wordSql("b.skey + 1")} AS contract,
              |  ${wordSql("b.skey")} AS creator,
              |  b.l_orderkey % 997 AS block_number,
              |  (b.err = 1 OR txerr.tx_err = 1) AS failed,
              |  CASE WHEN b.l_orderkey % 2 = 0 THEN '$SkelHashBzzr0' ELSE '$SkelHashIpfs' END AS skeleton_hash,
              |  CASE WHEN b.l_orderkey % 2 = 1 THEN '0.8.7' END AS solc_version,
              |  CASE WHEN b.l_orderkey % 2 = 0 THEN 'bzzr0' ELSE 'ipfs' END AS storage_protocol,
              |  CASE WHEN b.l_orderkey % 2 = 0 THEN '$StorageHashBzzr0' ELSE '$StorageHashIpfs' END AS storage_address,
              |  false AS experimental
              |FROM base b JOIN txerr ON b.l_orderkey = txerr.l_orderkey
              |WHERE b.l_linenumber = 1""".stripMargin),
      "end-to-end extract leg: traces → deployments with real skeleton/CBOR decode (extract.rs:84-289, P2+J2)"),

    // extract.rs leg 2: the Account dimension over ALL six entity inputs
    // (blocks, transactions, deployments, destructions, decoded
    // transfers, raw logs) — §2.7's union-distinct with is_contract.
    "q88_pipeline_accounts" -> Q(
      (s, d) => {
        val t = entityTraces(s, d)
        // materialize the synthesized log shape ONCE: the decoded-
        // transfer leg and the raw-log leg both consume it, and without
        // the checkpoint each union branch re-runs the events scan +
        // synthesis
        val logs = entityLogs(s, d).localCheckpoint()
        val blocks = orders(s, d).select(
          col("o_orderkey").as("number"), word(col("o_custkey")).as("miner"))
        val txs = lineitem(s, d).where(col("l_linenumber") === 1)
          .groupBy(col("l_orderkey"))
          .agg(min(col("l_suppkey")).as("skey"), min(col("l_partkey")).as("pkey"))
          .select(word(col("skey")).as("from"), word(col("pkey") + 1000000L).as("to"))
        Enrich.accounts(
          blocks, txs,
          Decode.deployments(t), Decode.destructions(t),
          Decode.transfersFromLogs(logs), logs)
      },
      Some(s"""WITH $baseSql,
              |tr AS (
              |  SELECT '0x' || substring(lpad(lower(to_hex(user_id)), 64, '0'), 25, 40) AS f,
              |         '0x' || substring(lpad(lower(to_hex(user_id + 7)), 64, '0'), 25, 40) AS t,
              |         ${wordSql("user_id + 7777777")} AS c
              |  FROM events WHERE event_type IN ('click', 'purchase')),
              |addrs AS (
              |  SELECT ${wordSql("o_custkey")} AS address, false AS isc FROM orders
              |  UNION ALL SELECT ${wordSql("skey")}, false FROM base WHERE l_linenumber = 1
              |  UNION ALL SELECT ${wordSql("pkey + 1000000")}, false FROM base WHERE l_linenumber = 1
              |  UNION ALL SELECT ${wordSql("skey + 1")}, true FROM base WHERE l_linenumber = 1
              |  UNION ALL SELECT ${wordSql("skey")}, false FROM base WHERE l_linenumber = 1
              |  UNION ALL SELECT ${wordSql("skey + 1")}, true FROM base WHERE l_linenumber = 7
              |  UNION ALL SELECT ${wordSql("pkey")}, false FROM base WHERE l_linenumber = 7
              |  UNION ALL SELECT f, false FROM tr
              |  UNION ALL SELECT t, false FROM tr
              |  UNION ALL SELECT c, true FROM tr
              |  UNION ALL SELECT ${wordSql("user_id + 7777777")}, true FROM events)
              |SELECT address, bool_or(isc) AS is_contract FROM addrs GROUP BY 1""".stripMargin),
      "end-to-end extract leg: six-input Account dimension (extract.rs:84-289, §2.7/J4)"),

    // extract.rs leg 3: per-block gas stats (A1/A2/F13) through the
    // production Enrich.blockGasStats — exact decimal power sums, so the
    // doubles are aggregation-order-independent and oracle-checkable.
    // Gas prices are whole-gwei multiples and some rows carry NULL
    // (type-2-style txs) to exercise the priced-count path.
    "q89_pipeline_blockstats" -> Q(
      (s, d) => {
        val blocks = orders(s, d)
          .groupBy((col("o_orderkey") % 211L).as("number"))
          .agg((min(col("o_custkey")) * 1000000000L).as("base_fee_per_gas"))
        val txs = lineitem(s, d).select(
          (col("l_orderkey") % 211L).as("block_number"),
          when(col("l_returnflag") === "N",
            col("l_quantity").cast("bigint") * 1000000000L).as("gas_price"))
        Enrich.blockGasStats(blocks, txs)
          .select(col("number"), col("tx_count"),
            round(col("gas_price_min"), 6).as("gas_price_min"),
            round(col("gas_price_max"), 6).as("gas_price_max"),
            round(col("gas_price_avg"), 6).as("gas_price_avg"),
            round(col("gas_price_std_dev"), 6).as("gas_price_std_dev"),
            col("base_fee_per_gas"))
      },
      Some("""WITH b AS (
             |  SELECT o_orderkey % 211 AS number,
             |         min(o_custkey) * 1000000000 AS base_fee_wei
             |  FROM orders GROUP BY 1),
             |t AS (
             |  SELECT l_orderkey % 211 AS block_number,
             |         CASE WHEN l_returnflag = 'N'
             |           THEN CAST(l_quantity AS BIGINT) * 1000000000 END AS gas_price
             |  FROM lineitem),
             |s AS (
             |  SELECT block_number,
             |         count(*) AS tx_count,
             |         count(gas_price) AS n,
             |         CAST(min(CAST(gas_price AS DECIMAL(38,0))) AS DOUBLE) AS mn,
             |         CAST(max(CAST(gas_price AS DECIMAL(38,0))) AS DOUBLE) AS mx,
             |         CAST(sum(CAST(gas_price AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             |         CAST(sum(CAST(gas_price AS DECIMAL(38,0)) * CAST(gas_price AS DECIMAL(38,0))) AS DOUBLE) AS s2
             |  FROM t GROUP BY 1)
             |SELECT b.number, coalesce(s.tx_count, 0) AS tx_count,
             |  round(mn / 1e9, 6) AS gas_price_min,
             |  round(mx / 1e9, 6) AS gas_price_max,
             |  round(s1 / n / 1e9, 6) AS gas_price_avg,
             |  round(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0)) / 1e9, 6) AS gas_price_std_dev,
             |  b.base_fee_wei / 1e9 AS base_fee_per_gas
             |FROM b LEFT JOIN s ON b.number = s.block_number""".stripMargin),
      "end-to-end extract leg: per-block gas stats through Enrich.blockGasStats (A1/A2/F13)"),

    // similarities.rs:45-107 compare_single: the ADDRESS entry point.
    // The queried address resolves to its latest deployment (two-hop:
    // address → deployment → skeleton), the distinct-skeleton universe
    // goes through the real dedup-first decompiler stage to interface
    // sets, the one-vs-all jaccard runs against the looked-up target
    // hash (1-row broadcast, no driver round-trip), and similar
    // skeletons fan back out to the contracts carrying them. The
    // stand-in decompiler emits fn_<len(skeleton)>, so the two pinned
    // skeletons ("60006000526000600055" / "6000600052610000600055")
    // yield interfaces the oracle states verbatim (fn_20 / fn_22).
    "q90_similar_to_address" -> Q(
      (s, d) => {
        import graft.analytics.Similarity
        val script = java.nio.file.Paths.get(graft.Temps.dirFor("decompiler"))
          .resolve("decompile.sh")
        java.nio.file.Files.writeString(script,
          "#!/bin/sh\n" +
          "printf '[{\"type\":\"function\",\"name\":\"fn_%s\",\"inputs\":[],\"outputs\":[]}]' ${#1}\n")
        val deps = Decode.deployments(entityTraces(s, d))
          .withColumn("skeleton", Decode.skeletonHex(col("deployed_bytecode")))
        // the query input: an address (here the one deployed by the
        // lexicographically-first tx, so every SF has it)
        val target = deps.orderBy(col("tx_hash")).limit(1)
          .select(col("contract").as("t_addr"))
        // hop 1: address → its LATEST deployment → target skeleton hash
        val tSkel = deps.join(broadcast(target), col("contract") === col("t_addr"))
          .groupBy(col("t_addr"))
          .agg(max(struct(col("block_number"), col("tx_hash"),
            col("skeleton_hash"))).as("r"))
          .select(col("t_addr"), col("r.skeleton_hash").as("t_hash"))
        // hop 2: distinct skeletons → decompile (dedup-first) → interfaces
        val abi = graft.etl.Decompile.parseAbi(graft.etl.Decompile.run(
          deps.select(col("skeleton_hash"), col("skeleton").as("bytecode")),
          Seq("sh", script.toString), timeoutMs = 10000L).toDF())
        val sims = Similarity.similarToTarget(
          Similarity.interfaceSets(abi), tSkel, threshold = 0.0)
        // fan back out: every contract carrying a similar skeleton
        deps.select(col("contract"), col("skeleton_hash")).distinct()
          .join(sims, "skeleton_hash")
          .crossJoin(broadcast(tSkel.select(col("t_addr"))))
          .where(col("contract") =!= col("t_addr"))
          .select(col("contract"), col("skeleton_hash"),
            round(col("jaccard"), 6).as("jaccard"))
      },
      Some(s"""WITH $baseSql,
              |dep AS (
              |  SELECT CAST(l_orderkey AS VARCHAR) AS tx_hash,
              |         ${wordSql("skey + 1")} AS contract,
              |         l_orderkey % 997 AS block_number,
              |         CASE WHEN l_orderkey % 2 = 0 THEN '$SkelHashBzzr0' ELSE '$SkelHashIpfs' END AS skeleton_hash,
              |         CASE WHEN l_orderkey % 2 = 0 THEN 'fn_20' ELSE 'fn_22' END AS iface
              |  FROM base WHERE l_linenumber = 1),
              |tgt AS (
              |  SELECT contract AS t_addr FROM dep
              |  WHERE tx_hash = (SELECT min(tx_hash) FROM dep)),
              |tskel AS (
              |  SELECT d.contract AS t_addr, d.skeleton_hash AS t_hash, d.iface AS t_if
              |  FROM dep d JOIN tgt ON d.contract = tgt.t_addr
              |  ORDER BY d.block_number DESC, d.tx_hash DESC LIMIT 1),
              |sims AS (
              |  SELECT s.skeleton_hash,
              |         CASE WHEN s.iface = t.t_if THEN 1.0 ELSE 0.0 END AS jaccard
              |  FROM (SELECT DISTINCT skeleton_hash, iface FROM dep) s, tskel t
              |  WHERE s.skeleton_hash <> t.t_hash)
              |SELECT DISTINCT d.contract, d.skeleton_hash, round(s.jaccard, 6) AS jaccard
              |FROM dep d JOIN sims s ON d.skeleton_hash = s.skeleton_hash, tskel t
              |WHERE d.contract <> t.t_addr""".stripMargin),
      "compare_single address entry point: address → deployment → skeleton → one-vs-all (similarities.rs:45-107, J8)"),

    // contract_deployment.rs:118-156 resolve_name: the per-contract
    // name() eth_call enrichment (J9/U2) — a REAL mapPartitions HTTP
    // JSON-RPC client (keep-alive connection per partition, distinct
    // addresses only, error → resolved=false) against the deterministic
    // local stub node, joined back onto deployments via enrichNames.
    // The oracle replays the stub's name rule in SQL.
    "q91_rpc_names" -> Q(
      (s, d) => {
        val deps = Decode.deployments(entityTraces(s, d))
        val names = graft.sources.Rpc.resolveNames(deps, graft.sources.RpcStub.endpoint)
        graft.sources.Sanctuary.enrichNames(deps,
            names.select(col("contract").as("address"), col("name")))
          .select(col("tx_hash"), col("contract"), col("name"))
      },
      Some(s"""WITH $baseSql
              |SELECT CAST(l_orderkey AS VARCHAR) AS tx_hash,
              |  ${wordSql("skey + 1")} AS contract,
              |  CASE WHEN CAST(right(${wordSql("skey + 1")}, 1) AS INT) % 3 = 0
              |       THEN NULL ELSE 'C' || right(${wordSql("skey + 1")}, 4) END AS name
              |FROM base WHERE l_linenumber = 1""".stripMargin),
      "name() eth_call enrichment through the real RPC client (contract_deployment.rs:118-156, J9/U2)"))
}
