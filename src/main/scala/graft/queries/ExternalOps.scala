package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import graft.sources.Sanctuary
import Tables._

/** The external surfaces (SURVEY §2.1 S5, §2.4 J10, §2.9 U1) under the
  * driver's oracle gate. Each query synthesizes its external input
  * (a sanctuary source tree / a decompiler executable) DETERMINISTICALLY
  * from a driver table, runs the real operator against it, and the
  * DuckDB oracle recomputes the expected outcome from the same table in
  * pure SQL — so the filesystem/subprocess plumbing itself is what gets
  * verified. */
object ExternalOps {

  /** Keys < this bound exist at every driver scale factor (part keys
    * are dense 0..N-1; N=200 at sf0.001). */
  private val KeyBound = 180

  private def addrHex(k: Long): String = f"$k%040x"

  /** Build contracts/mainnet/<2-hex>/<addr>_Name<k>.sol for every
    * third key — the reference sanctuary layout (F14's glob shape). */
  private def buildTree(keys: Seq[Long]): Path = {
    // memoized root (same tree every invocation) — rewriting the same
    // files is idempotent; the Temps shutdown hook cleans up
    val root = java.nio.file.Paths.get(graft.Temps.dirFor("sanctuary"))
    keys.foreach { k =>
      val addr = addrHex(k)
      val shard = root.resolve("contracts").resolve("mainnet").resolve(addr.take(2))
      Files.createDirectories(shard)
      Files.writeString(shard.resolve(s"${addr}_Name$k.sol"), s"pragma src $k;")
    }
    root
  }

  def defs: Map[String, Q] = Map(
    // S5 + J10: index a real on-disk source tree (text source,
    // recursive listing, path regex) and verify deployments against it
    "q45_sanctuary" -> Q(
      (s, d) => {
        val keys = (0L until KeyBound.toLong).filter(_ % 3 == 0)
        val root = buildTree(keys)
        val idx = Sanctuary.index(s, root.toString)
        val deployments = part(s, d).where(col("p_partkey") < KeyBound)
          .select(col("p_partkey"),
            lower(concat(lit("0x"), format_string("%040x", col("p_partkey"))))
              .as("contract"))
        Sanctuary.verify(deployments, idx)
          .select(col("p_partkey"), col("verified_source"), col("source_name"))
      },
      Some(s"""SELECT p_partkey,
              | (p_partkey % 3 = 0) AS verified_source,
              | CASE WHEN p_partkey % 3 = 0 THEN 'Name' || CAST(p_partkey AS VARCHAR) END AS source_name
              |FROM part WHERE p_partkey < $KeyBound""".stripMargin),
      "sanctuary source tree index + verified-source join (S5/J10)"),

    // U1: the real subprocess stage against a deterministic stand-in
    // decompiler (emits ABI JSON derived from its argument), dedup-first
    "q46_decompile" -> Q(
      (s, d) => {
        val script = java.nio.file.Paths.get(graft.Temps.dirFor("decompiler"))
          .resolve("decompile.sh")
        Files.writeString(script,
          "#!/bin/sh\n" +
          "printf '[{\"type\":\"function\",\"name\":\"fn_%s\",\"inputs\":[],\"outputs\":[]}]' ${#1}\n")
        val sk = part(s, d).where(col("p_partkey") < KeyBound)
          .select(
            md5(concat(col("p_name"), col("p_partkey")).cast("binary")).as("skeleton_hash"),
            expr("substring(md5(cast(p_name as binary)), 1, cast((p_partkey % 8) * 4 + 8 as int))")
              .as("bytecode"))
        graft.etl.Decompile.run(sk, Seq("sh", script.toString), timeoutMs = 10000L)
          .select(col("skeleton_hash"),
            get_json_object(col("abi_json"), "$[0].name").as("abi_name"),
            col("failed_decompilation"))
      },
      Some(s"""SELECT md5(p_name || CAST(p_partkey AS VARCHAR)) AS skeleton_hash,
              | 'fn_' || CAST(LEAST((p_partkey % 8) * 4 + 8, 32) AS VARCHAR) AS abi_name,
              | false AS failed_decompilation
              |FROM part WHERE p_partkey < $KeyBound""".stripMargin),
      "external decompiler subprocess stage, dedup-first (U1/A4)"),

    // K2: the gzip-JSON bulk-load sink round-trips losslessly — write
    // through the real writer, read back with an explicit schema,
    // aggregate; money stays a decimal STRING across the JSON hop
    "q81_jsongz_roundtrip" -> Q(
      (s, d) => {
        val out = graft.Temps.dirFor(s"jsongz-$d") // writer is mode=overwrite
        val sub = orders(s, d).select(
          col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_s"))
        graft.sinks.Layout.writeJsonGz(sub, out)
        s.read
          .schema("o_orderkey BIGINT, o_orderpriority STRING, price_s STRING")
          .json(out)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("price_s").cast("decimal(18,2)")).cast("double").as("sum_price"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY 1""".stripMargin),
      "gzip JSON sink/source round trip preserves every row (K2)"))
}
