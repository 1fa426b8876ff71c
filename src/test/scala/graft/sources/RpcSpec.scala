package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The eth_call name() enrichment stage (J9/U2): the real HTTP JSON-RPC
  * client against the local stub node — resolution, the error path, and
  * the ABI string codec. */
class RpcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("ABI string codec round-trips, rejects malformed") {
    assert(Rpc.decodeAbiString(RpcStub.abiEncodeString("Wrapped Ether"))
      === Some("Wrapped Ether"))
    assert(Rpc.decodeAbiString(RpcStub.abiEncodeString("")) === Some(""))
    // 33-byte name crosses a word boundary in the padded data
    val long = "x" * 33
    assert(Rpc.decodeAbiString(RpcStub.abiEncodeString(long)) === Some(long))
    assert(Rpc.decodeAbiString("0x") === None)
    assert(Rpc.decodeAbiString("0xdeadbeef") === None)
  }

  test("resolveNames: per-partition client resolves by rule, errors degrade") {
    import spark.implicits._
    // last digit 3/6/9/0 → stub answers an RPC error → resolved=false
    val deps = Seq("0001", "0002", "0003", "0146", "9999", "0002")
      .toDF("contract")
    val got = Rpc.resolveNames(deps, RpcStub.endpoint)
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
      .toSet
    assert(got === Set(
      ("0001", Some("C0001"), true),
      ("0002", Some("C0002"), true), // deduped: one row despite two inputs
      ("0003", None, false),
      ("0146", None, false),
      ("9999", None, false)))
  }

  test("unreachable endpoint degrades to resolved=false, not task failure") {
    import spark.implicits._
    val got = Rpc.resolveNames(Seq("0001").toDF("contract"),
      "http://127.0.0.1:1/").collect()
    assert(got.length === 1 && !got(0).getBoolean(2))
  }
}
