package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
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

  test("asofJoin equals the naive max-per-row formulation on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small time domain forces boundary ties; right deduped at (k, t)
    val left = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 150).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "t", "rid")
    val got = AsOf.asofJoin(left, "k", "t", right, "k", "t", Seq("rid"))
      .select(col("lid"), col("asof_rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    // naive: per left row, the right row with max t <= left.t
    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = left.collect().map { lr =>
      val (k, t, lid) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      val m = rightRows.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.toMap
    assert(got === want)
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
