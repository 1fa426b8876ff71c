package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bandedRangeJoin equals the naive inequality join (incl. boundaries)") {
    import spark.implicits._
    val us = 1000000L
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // points around interval edges, multiple keys, bucket-straddling intervals
    val left = Seq(
      (1L, 10L), (1L, 59L), (1L, 60L), (1L, 61L), (1L, 119L), (1L, 120L),
      (2L, 10L), (3L, 500L)
    ).map { case (k, sec) => (k, ts(sec), s"p$k-$sec") }.toDF("k", "t", "pid")
    val right = Seq(
      (1L, 0L, 120L, "i1"),   // [0, 120) straddles several 30s buckets
      (1L, 60L, 61L, "i2"),   // [60, 61) single-second interval
      (2L, 0L, 11L, "i3"),    // [0, 11) catches the boundary point 10
      (4L, 0L, 1000L, "i4")   // key with no points
    ).map { case (k, s, e, n) => (k, ts(s), ts(e), n) }.toDF("k", "s", "e", "name")

    val banded = RangeJoin.bandedRangeJoin(left, "k", "t", right, "k", "s", "e",
        Seq("name"), bucketUs = 30L * us)
      .select(col("pid"), col("name"))
    val naive = left.join(right, left("k") === right("k") &&
        col("t") >= col("s") && col("t") < col("e"))
      .select(col("pid"), col("name"))
    assert(banded.collect().toSet === naive.collect().toSet)
    assert(banded.count() === naive.count()) // multiset equality (no dups)
    // sanity on semantics: t=60 matches both i1 and i2; t=120 matches none
    val byPid = banded.collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(byPid("p1-60") === Set("i1", "i2"))
    assert(!byPid.contains("p1-120"))
    assert(byPid("p2-10") === Set("i3"))
  }

  test("bandedRangeJoin equals the naive join on seeded random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(600).toLong), i.toLong)).toDF("k", "t", "lid")
    val right = (1 to 120).map { i =>
      val s = rnd.nextInt(600).toLong
      (rnd.nextInt(4).toLong, ts(s), ts(s + 1 + rnd.nextInt(150)), i.toLong)
    }.toDF("k", "s", "e", "rid")
    val banded = RangeJoin.bandedRangeJoin(left, "k", "t", right, "k", "s", "e",
        Seq("rid"), bucketUs = 60L * 1000000L)
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, left("k") === right("k") &&
        col("t") >= col("s") && col("t") < col("e"))
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
    assert(naive.nonEmpty) // the generator actually produced matches
  }
}
