package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.RpcStub

/** The composed `extract` program (main.rs:18-26) against the stub
  * node: every entity lands in the reference layout with the counts
  * the stub rules predict, plus the schema artifact. */
class ExtractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("extract lands all nine entities + schema with rule-predicted counts") {
    val out = graft.Temps.dir("extract-spec")
    val counts = Extract.run(spark, RpcStub.endpoint, 700L, 710L, out)

    val blocks = (700L to 710L)
    val txs = blocks.flatMap(n => (0 until RpcStub.txCountOf(n)).map(n -> _))
    assert(counts("blocks") === blocks.size)
    assert(counts("withdrawals") === blocks.map(RpcStub.wdCountOf(_).toLong).sum)
    assert(counts("transactions") === txs.size)
    assert(counts("deployments") === txs.count { case (_, i) => i % 4 == 1 })
    assert(counts("destructions") === txs.count { case (_, i) => i % 4 == 3 })
    assert(counts("transfers") === txs.count { case (_, i) => i % 2 == 0 })
    assert(counts("logs") === txs.size) // one log per tx, all arities
    assert(counts("skeletons") === 2) // the two golden bytecodes
    // accounts: at least every distinct miner + every created contract
    assert(counts("accounts") >
      blocks.map(RpcStub.minerOf).distinct.size.toLong)

    // contract addresses carry is_contract=true through the dimension
    val contracts = spark.read.parquet(s"$out/static/accounts")
      .where(org.apache.spark.sql.functions.col("is_contract"))
      .collect().map(_.getString(0)).toSet
    val someCreated = RpcStub.createdAddressOf(701L, 1)
    assert(contracts.contains(someCreated))

    // the schema artifact landed next to the shards
    val schema = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/contracts.schema")))
    assert(schema.contains("accounts.address: string @index(hash) @upsert ."))

    // replayed dynamic writes stay idempotent (K5): re-running the
    // same range must not duplicate block-keyed entities
    val counts2 = Extract.run(spark, RpcStub.endpoint, 700L, 710L, out)
    assert(counts2("transactions") === counts("transactions"))
    assert(counts2("logs") === counts("logs"))
  }
}
