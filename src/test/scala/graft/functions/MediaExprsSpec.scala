package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[MediaExprs.dHashQuartersEval]] contract — the perceptual hash
  * under q216's banded near-dup dedup:
  *
  *  1. structure — monotone payloads pin the comparison layout (all
  *     bits / no bits), empty payloads hash to zero quarters;
  *  2. metric — a one-byte change moves ≤ 2 bits (it perturbs one
  *     grid cell, which participates in ≤ 2 adjacent comparisons),
  *     the property the banded join's radius budget rides on;
  *  3. engine parity — the native expression inside a Spark plan
  *     equals the static eval (codegen path = interpreted path).
  */
class MediaExprsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def quarters(bytes: Array[Byte]): Seq[Long] =
    MediaExprs.dHashQuartersEval(bytes).toLongArray().toSeq

  test("strictly increasing bytes set every comparison bit; decreasing none; empty zero") {
    // 144 bytes = 2 per grid cell; increasing payload → every cell
    // mean strictly below its right neighbor → all 64 bits
    val inc = Array.tabulate(144)(i => i.toByte)
    assert(quarters(inc) === Seq(65535L, 65535L, 65535L, 65535L))
    val dec = Array.tabulate(144)(i => (200 - i).toByte)
    assert(quarters(dec) === Seq(0L, 0L, 0L, 0L))
    assert(quarters(Array.emptyByteArray) === Seq(0L, 0L, 0L, 0L))
  }

  test("a one-byte change moves at most 2 bits (the near-dup metric property)") {
    val rnd = new scala.util.Random(42)
    val base = Array.fill(360)(rnd.nextInt(256).toByte)
    val q0 = quarters(base)
    for (pos <- Seq(0, 77, 180, 359)) {
      val mut = base.clone()
      mut(pos) = (mut(pos) + 97).toByte
      val q1 = quarters(mut)
      val d = (0 until 4).map(k =>
        java.lang.Long.bitCount(q0(k) ^ q1(k))).sum
      assert(d <= 2, s"one byte at $pos moved $d bits")
    }
  }

  test("dedup manifest: a one-byte variant dups to its original as representative") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // three distinct payloads + a one-byte variant of the first: the
    // variant (larger id) must resolve dup → rep 1; originals kept
    val rows = Seq(
      1L -> ("alpha document body " * 8),
      2L -> ("ZZZZ@@@@" * 24),
      3L -> (('a' to 'z').mkString * 6),
      9L -> ("alphA document body " + ("alpha document body " * 7)))
    val media = graft.ops.Multimodal.asMedia(
      rows.toDF("doc_id", "text"), "doc_id", "text")
    val got = graft.ops.Multimodal.dHashDedupManifest(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got.contains((9L, "dup", 1L)), got.toString)
    assert(got.filter(_._2 == "kept").map(_._1) === Set(1L, 2L, 3L))
  }

  test("wide 16x9 grid: 8 quarters, same metric property, same band-key budget") {
    // the r14 width lever: doubling the rows doubles the bands (and
    // the pigeonhole radius the banded join is exact through) while
    // every quarter stays within the 16-bit band-key budget
    def wide(bytes: Array[Byte]): Seq[Long] =
      MediaExprs.dHashQuartersEval(bytes, 16, 9).toLongArray().toSeq
    // 1 byte per 16×9 cell (more would wrap the unsigned byte range
    // mid-payload and break monotonicity)
    val inc = Array.tabulate(144)(i => i.toByte)
    assert(wide(inc) === Seq.fill(8)(65535L))
    assert(wide(Array.emptyByteArray) === Seq.fill(8)(0L))
    // one byte perturbs one grid cell → ≤ 2 adjacent comparisons, at
    // any width
    val rnd = new scala.util.Random(7)
    val base = Array.fill(432)(rnd.nextInt(256).toByte)
    val q0 = wide(base)
    for (pos <- Seq(0, 100, 250, 431)) {
      val mut = base.clone()
      mut(pos) = (mut(pos) + 113).toByte
      val q1 = wide(mut)
      val d = (0 until 8).map(k =>
        java.lang.Long.bitCount(q0(k) ^ q1(k))).sum
      assert(d <= 2, s"one byte at $pos moved $d bits")
    }
    // width-generic banded pairs: at the wide grid the (orig, variant)
    // pair still surfaces (pigeonhole now covers radius 7) and every
    // reported distance is exact over the 128 bits
    val s = spark
    import s.implicits._
    val media = graft.ops.Multimodal.asMedia(
      Seq(1L -> ("alpha document body " * 8),
          2L -> ("ZZZZ@@@@" * 24),
          9L -> ("alphA document body " + ("alpha document body " * 7)))
        .toDF("doc_id", "text"), "doc_id", "text")
    val pairs = graft.ops.Multimodal
      .dHashNearDupPairs(media, maxHamming = 7, gridRows = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 9L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // narrow default unchanged by the generalization (the q216/q218
    // hash): 8×9 via the generic path == the 1-arg legacy path
    val n1 = MediaExprs.dHashQuartersEval(base).toLongArray().toSeq
    val n2 = MediaExprs.dHashQuartersEval(base, 8, 9).toLongArray().toSeq
    assert(n1 === n2)
  }

  test("the native expression in a plan equals the static eval") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and keeps going",
      2L -> "", 3L -> "short", 4L -> ("x" * 200))
    val df = rows.toDF("id", "text")
      .select(col("id"),
        MediaExprs.dHashQuarters(col("text").cast("binary")).as("qs"))
    val got = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, t) =>
      assert(got(id) === quarters(t.getBytes("UTF-8")), s"id $id")
    }
    // quarters are 16-bit by construction
    got.values.flatten.foreach(q => assert(q >= 0L && q <= 65535L))
  }
}
