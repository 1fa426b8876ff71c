package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.CmsExprs

class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // zipf-ish item stream: item i appears 1000/(i+1) times → heavies
  // are few, their occurrences many, and a long tail of singletons
  private def items = {
    import spark.implicits._
    (0 until 200).flatMap(i => Seq.fill(1000 / (i + 1))(i.toLong))
      .toDF("item")
  }

  test("gated output equals GROUP BY/HAVING across eps, incl. a coarse sketch") {
    import spark.implicits._
    val expected = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 50)
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    // coarse eps forces collisions (overestimates at the margin) — the
    // exact recount must eat them at every setting
    for (eps <- Seq(0.5, 0.01, 0.0001)) {
      val got = HeavyHitters.atLeast(items, "item", 50L, eps = eps)
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"eps=$eps")
    }
  }

  test("no false negatives: every true heavy row is admitted by the probe") {
    val cms = items.stat.countMinSketch("item", 0.01, 0.99, 42)
    val missed = items.where(col("item") < 20) // items 0..19 have cnt ≥ 50
      .where(CmsExprs.estimate(cms)(col("item")) < 50L)
      .count()
    assert(missed === 0L)
  }

  test("the probe prunes the tail: admitted rows well under the stream") {
    val cms = items.stat.countMinSketch("item", 0.0001, 0.99, 42)
    val total = items.count()
    val admitted = items
      .where(CmsExprs.estimate(cms)(col("item")) >= 50L).count()
    val heavyRows = items.where(col("item") < 20).count()
    assert(admitted >= heavyRows)          // superset of the true heavies
    // the TAIL is what gets pruned: false-positive admissions are a
    // sliver of the tail rows (the heavies' own rows are the work the
    // exact recount legitimately owes)
    val tailRows = total - heavyRows
    assert(admitted - heavyRows <= tailRows / 10,
      s"admitted=$admitted heavyRows=$heavyRows tailRows=$tailRows")
  }

  test("sketch estimates are partitioning-independent for a fixed seed") {
    val a = CmsExprs.serialize(items.stat.countMinSketch("item", 0.01, 0.99, 7))
    val b = CmsExprs.serialize(
      items.repartition(13).stat.countMinSketch("item", 0.01, 0.99, 7))
    assert(java.util.Arrays.equals(a, b))
  }
}
