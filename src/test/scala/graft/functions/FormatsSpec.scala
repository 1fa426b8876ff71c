package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.TestSpark

class FormatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("F8/F9/F10: rfc3339, delta seconds, wei->gwei") {
    import spark.implicits._
    val df = Seq(("2023-01-01 12:30:05", 15000000000L)).toDF("ts", "wei")
      .select(col("ts").cast("timestamp").as("ts"), col("wei"))
    val r = df.select(
      Formats.rfc3339(col("ts")).as("r"),
      Formats.deltaSeconds(col("ts") + expr("INTERVAL 90 SECONDS"), col("ts")).as("d"),
      Formats.weiToGwei(col("wei")).as("g")).head()
    assert(r.getAs[String]("r") === "2023-01-01T12:30:05Z") // UTC session tz
    assert(r.getAs[Long]("d") === 90L)
    assert(r.getAs[Double]("g") === 15.0)
  }

  test("F16: ABI set equality is order-insensitive") {
    import spark.implicits._
    val df = Seq((Seq("b()", "a(uint256)"), Seq("a(uint256)", "b()"), Seq("a(uint256)")))
      .toDF("x", "y", "z")
    val r = df.select(
      Formats.abiSetEquals(col("x"), col("y")).as("eq"),
      Formats.abiSetEquals(col("x"), col("z")).as("ne")).head()
    assert(r.getAs[Boolean]("eq") === true)
    assert(r.getAs[Boolean]("ne") === false)
  }

  test("withdrawals explode keeps uint256 strings + block FK") {
    import graft.domain.Schemas
    val rows = Seq(Row(100L, null, "0xminer", "1", 2L, null, null, null, null,
      null, null, null, 5000L,
      Seq(Row("0xabc", "12000000000000000000000000000000000000", 7L, 42L))))
    val blocks = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.block)
    val w = graft.etl.Decode.explodeWithdrawals(blocks).collect()
    assert(w.length === 1)
    assert(w.head.getAs[String]("amount") === "12000000000000000000000000000000000000")
    assert(w.head.getAs[Long]("block_number") === 100L)
    assert(w.head.getAs[Long]("validator_index") === 42L)
  }
}
