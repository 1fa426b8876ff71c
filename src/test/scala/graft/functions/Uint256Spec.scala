package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class Uint256Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sums past 2^64 and 2^128 exactly (decimal strings)") {
    import spark.implicits._
    // 2^255 + 2^255 = 2^256 — far past any fixed-width type
    val big = BigInt(2).pow(255).toString
    val df = Seq(big, big, "1").toDF("v")
    val out = df.agg(Uint256.sum(col("v"))).head.getString(0)
    assert(out === (BigInt(2).pow(256) + 1).toString)
  }

  test("accepts 0x-hex words, skips nulls, empty group sums to 0") {
    import spark.implicits._
    val df = Seq(Some("0xff"), None, Some("10"), Some("0x")).toDF("v")
    assert(df.agg(Uint256.sum(col("v"))).head.getString(0) === "265")
    val empty = Seq.empty[String].toDF("v")
    assert(empty.agg(Uint256.sum(col("v"))).head.getString(0) === "0")
  }

  test("grouped sums with map-side partials match per-group BigInt math") {
    import spark.implicits._
    val rows = (1 to 1000).map(i => (i % 7, BigInt(i).pow(5).toString))
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g").agg(Uint256.sum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getString(1))).toMap
    val want = rows.groupBy(_._1).view.mapValues(_.map(t => BigInt(t._2)).sum).toMap
    assert(got === want)
  }

  test("available from SQL as graft_uint256_sum") {
    graft.GraftFunctions.register(spark)
    import spark.implicits._
    Seq("5", "6").toDF("v").createOrReplaceTempView("v_u256")
    assert(spark.sql("SELECT graft_uint256_sum(v) AS s FROM v_u256")
      .head.getString(0) === "11")
  }
}
