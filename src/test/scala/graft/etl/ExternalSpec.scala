package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Sanctuary
import graft.sinks.Layout
import graft.analytics.Lifetimes
import java.nio.file.{Files, Paths}

/** Specs for the out-of-engine surfaces: sanctuary filesystem source
  * (S5/J10/F14), external decompiler stage (U1/A4 + F15 ABI parse),
  * similarity-edge sink (K6) and the lifetimes report (K7). */
class ExternalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import Fixtures.{addr, hash}

  test("S5/J10: sanctuary tree index + verified-source join") {
    val root = graft.Temps.dir("sanctuary-spec")
    val a20 = addr(20).stripPrefix("0x")
    val shard = a20.substring(0, 2)
    Files.createDirectories(Paths.get(s"$root/mainnet/$shard"))
    Files.writeString(Paths.get(s"$root/mainnet/$shard/${a20}_MyToken.sol"),
      "contract MyToken {}")
    Files.createDirectories(Paths.get(s"$root/mainnet/ff"))
    Files.writeString(Paths.get(s"$root/mainnet/ff/not-an-address.sol"), "x")

    val idx = Sanctuary.index(spark, root)
    val rows = idx.collect()
    assert(rows.length === 1) // malformed filename filtered out
    assert(rows.head.getAs[String]("address") === addr(20))
    assert(rows.head.getAs[String]("source_name") === "MyToken")

    val deps = Decode.deployments(Fixtures.traces(spark))
    val verified = Sanctuary.verify(deps, idx).collect()
      .map(r => r.getAs[String]("contract") -> r.getAs[Boolean]("verified_source")).toMap
    assert(verified(addr(20)) === true)
    assert(verified(addr(21)) === false)
  }

  test("S5/J10: listing-only index verifies without reading file bodies") {
    val root = graft.Temps.dir("sanctuary-listing")
    val a20 = addr(20).stripPrefix("0x")
    Files.createDirectories(Paths.get(s"$root/mainnet/${a20.take(2)}"))
    Files.writeString(Paths.get(s"$root/mainnet/${a20.take(2)}/${a20}_MyToken.sol"),
      "contract MyToken {}")

    val idx = Sanctuary.indexListing(spark, root)
    // metadata only: the index schema has no source_code column
    assert(!idx.columns.contains("source_code"))
    val rows = idx.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("address") === addr(20))
    assert(rows.head.getAs[String]("source_name") === "MyToken")

    val verified = Sanctuary.verify(Decode.deployments(Fixtures.traces(spark)), idx)
    assert(!verified.columns.contains("source_code"))
    val flags = verified.collect()
      .map(r => r.getAs[String]("contract") -> r.getAs[Boolean]("verified_source")).toMap
    assert(flags(addr(20)) === true)
    assert(flags(addr(21)) === false)
  }

  test("J9: name enrichment via lookup-table join") {
    import spark.implicits._
    val names = Seq((addr(20), "TokenA")).toDF("address", "name")
    val named = Sanctuary.enrichNames(Decode.deployments(Fixtures.traces(spark)), names)
      .collect().map(r => r.getAs[String]("contract") -> r.getAs[String]("name")).toMap
    assert(named(addr(20)) === "TokenA")
    assert(named(addr(21)) === null)
  }

  test("U1/A4/F15: decompiler stage — dedup, subprocess, timeout, ABI parse") {
    import spark.implicits._
    val dir = java.nio.file.Paths.get(graft.Temps.dir("decomp"))
    val ok = dir.resolve("fake-decompiler.sh")
    Files.writeString(ok,
      """#!/bin/sh
        |echo '[{"type":"function","name":"transfer","inputs":[{"name":"to","internalType":"address"},{"name":"amount","internalType":"uint256"}],"outputs":[{"name":"","internalType":"bool"}],"stateMutability":"nonpayable"},{"type":"event","name":"Transfer","inputs":[]}]'
        |""".stripMargin)
    ok.toFile.setExecutable(true)
    val slow = dir.resolve("slow-decompiler.sh")
    Files.writeString(slow, "#!/bin/sh\nsleep 30\n")
    slow.toFile.setExecutable(true)

    // duplicate skeleton_hash rows — stage must decompile each ONCE
    val sk = Seq(
      ("0xaaa", "6001"), ("0xaaa", "6001"), ("0xbbb", "6002")
    ).toDF("skeleton_hash", "bytecode")

    val out = Decompile.run(sk, Seq(ok.toString)).collect()
    assert(out.length === 2) // dedup before the expensive op (A4)
    assert(out.forall(!_.failed_decompilation))

    val abi = Decompile.parseAbi(
      Decompile.run(sk.where(col("skeleton_hash") === "0xaaa"), Seq(ok.toString)).toDF())
      .collect()
    assert(abi.length === 2)
    val fn = abi.find(_.getAs[String]("kind") === "function").get
    assert(fn.getAs[String]("name") === "transfer")
    assert(fn.getAs[Seq[org.apache.spark.sql.Row]]("inputs").map(_.getAs[String]("internalType"))
      === Seq("address", "uint256"))

    // timeout path: 200 ms budget vs sleep 30 → failed, process killed
    val t0 = System.nanoTime()
    val timedOut = Decompile.run(sk.limit(1), Seq(slow.toString), timeoutMs = 200).collect()
    assert(timedOut.head.failed_decompilation)
    assert((System.nanoTime() - t0) / 1e9 < 15.0) // did not wait out the sleep
  }

  test("K6: similarity edges written in both directions") {
    import spark.implicits._
    val pairs = Seq(("a", "b", 0.9)).toDF("a_id", "b_id", "cosine")
    val edges = Layout.similarityEdges(pairs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(edges === Set(("a", "b", 0.9), ("b", "a", 0.9)))
  }

  test("K2: gzip JSON sink round-trips an entity table") {
    val out = graft.Temps.dir("jsongz-spec") + "/transfers"
    val transfers = Decode.transfersFromLogs(Fixtures.logs(spark))
    Layout.writeJsonGz(transfers, out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")))
    val back = spark.read.schema(transfers.schema).json(out)
    assert(back.count() === transfers.count())
    assert(back.exceptAll(transfers).isEmpty)
  }

  test("K7: lifetimes report formats all four RQs") {
    val rep = Lifetimes.report(Fixtures.deployments(spark), Fixtures.destructions2(spark))
    assert(rep.contains("RQ1: 4 of 5"))
    assert(rep.contains("RQ2: 3 destroyed exactly once, 1 more than once"))
    assert(rep.contains("RQ3: 1 deploy/destroy pairs in the same block (different tx), 1 in the same tx"))
    assert(rep.contains("RQ4: avg lifetime 3.25 blocks"))
  }
}
