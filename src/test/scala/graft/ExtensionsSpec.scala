package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface ([[GraftFunctions]] / [[GraftExtensions]]):
  * registered on the shared test session via the live-session path
  * (the builder-time path injects the identical table). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val sql = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("graft_keccak256 from SQL matches the known empty-input vector") {
    val hex = sql.sql("SELECT hex(graft_keccak256(CAST('' AS BINARY))) AS h")
      .head.getString(0).toLowerCase
    assert(hex === "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("graft_hex_to_dec and graft_token_hash from SQL") {
    val r = sql.sql(
      "SELECT graft_hex_to_dec('0xff') AS d, graft_token_hash('ab') AS t").head
    assert(r.getString(0) === "255")
    assert(r.getLong(1) === ('a'.toLong * 31 + 'b'.toLong) % 1000000007L)
  }

  test("graft_dot and graft_minhash_sig from SQL") {
    val d = sql.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head.getDouble(0)
    assert(d === 11.0)
    val sig = sql.sql(
      "SELECT graft_minhash_sig(array('a','b','c','d','e')) AS s")
      .head.getSeq[Long](0)
    assert(sig.length === 4)
  }

  test("graft_skeleton_hash from SQL equals the Column API") {
    import org.apache.spark.sql.functions.col
    val bytecode = "0x6001600201" // PUSH1 01 PUSH1 02 ADD
    val viaSql = sql.sql(s"SELECT graft_skeleton_hash('$bytecode') AS h").head.getString(0)
    import sql.implicits._
    val viaCol = Seq(bytecode).toDF("b")
      .select(graft.functions.EvmExprs.skeletonHash(col("b"))).head.getString(0)
    assert(viaSql === viaCol)
  }
}
