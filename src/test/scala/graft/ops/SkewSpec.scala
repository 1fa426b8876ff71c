package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("saltedJoin equals plain join on skewed data") {
    import spark.implicits._
    // 1000 rows of hot key 1, a few of others
    val big = ((1 to 1000).map(i => (1L, i.toLong)) ++ Seq((2L, 1L), (3L, 2L)))
      .toDF("k", "payload")
    val small = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val plain = big.join(small, Seq("k")).select("k", "payload", "v")
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8,
      saltSource = col("payload")).select("k", "payload", "v")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedCount equals plain count and spreads the hot key") {
    import spark.implicits._
    val df = ((1 to 5000).map(_ => 1L) ++ Seq(2L, 2L, 3L)).toDF("k")
      .withColumn("row", monotonically_increasing_id())
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", buckets = 16, saltSource = col("row"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted(1L) === 5000L)
  }
}
