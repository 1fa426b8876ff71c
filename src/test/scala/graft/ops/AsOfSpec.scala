package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("asofJoin: latest-wins, inclusive boundary, pre-match nulls, key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "e1"),   // after r@3 -> picks v3
      (1L, 10L, "e2"),  // at r@10 exactly -> inclusive, picks v10
      (1L, 2L, "e3"),   // before any right row -> null
      (2L, 100L, "e4"), // other key: only sees key-2 rows
      (3L, 50L, "e5")   // key with no right rows at all -> null
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, 3L, "v3"),
      (1L, 10L, "v10"),
      (1L, 20L, "v20"), // later than every left row -> never picked
      (2L, 99L, "w99")
    ).toDF("k", "t", "v")
    val res = AsOf.asofJoin(left, "k", "t", right, "k", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("asof_v")).toMap
    assert(res === Map(
      "e1" -> "v3", "e2" -> "v10", "e3" -> null, "e4" -> "w99", "e5" -> null))
  }

  test("asofJoin carries multiple payload columns and keeps left schema") {
    import spark.implicits._
    val left = Seq((1L, 5L, 42.0)).toDF("k", "t", "x")
    val right = Seq((1L, 4L, "a", 7L)).toDF("k", "t", "s", "m")
    val row = AsOf.asofJoin(left, "k", "t", right, "k", "t", Seq("s", "m")).head
    assert(row.getAs[Double]("x") === 42.0)
    assert(row.getAs[String]("asof_s") === "a")
    assert(row.getAs[Long]("asof_m") === 7L)
  }
}
