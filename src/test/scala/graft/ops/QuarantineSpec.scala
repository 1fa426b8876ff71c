package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuarantineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("tryMap forks poison rows into a queryable quarantine, keeps the rest") {
    import spark.implicits._
    val raw = Seq("10", "20", "not-a-number", "30", "").toDS()
    val r = Quarantine.tryMap(raw, (s: String) => s.toLong).persist()
    val good = Quarantine.ok(r).collect().sorted
    val bad = Quarantine.quarantined(r).collect().toMap
    assert(good.toSeq === Seq(10L, 20L, 30L))
    assert(bad.keySet === Set("not-a-number", ""))
    assert(bad("not-a-number").startsWith("NumberFormatException"))
    // totals reconcile: nothing silently dropped
    assert(good.length + bad.size === 5)
    r.unpersist()
  }

  test("quarantine is replayable after a fix") {
    import spark.implicits._
    val raw = Seq("1", "x2", "3").toDS()
    val r1 = Quarantine.tryMap(raw, (s: String) => s.toLong).persist()
    val retry = Quarantine.quarantined(r1).map(_._1) // the failed originals
    val r2 = Quarantine.tryMap(retry, (s: String) => s.stripPrefix("x").toLong)
    assert(Quarantine.ok(r2).collect().toSeq === Seq(2L))
    r1.unpersist()
  }
}
