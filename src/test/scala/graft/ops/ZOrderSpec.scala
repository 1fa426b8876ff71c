package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Z-order layout contract ([[ZOrder]]): the interleave is the Morton
  * number (pinned against an independent bit-twiddling reference), and
  * laying a grid out by zkey strictly shrinks the touched-file
  * footprint of a y-band probe vs an x-major layout — the skipping
  * claim the registered q163 quantifies on lineitem. */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, j) =>
      acc | (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))
    }

  test("interleave matches the reference Morton number over the key space") {
    val s = spark
    import s.implicits._
    val pairs = for (x <- 0L until 256L by 7L; y <- 0L until 256L by 11L)
      yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave(col("x"), col("y"), 8).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 8), s"($x,$y)")
    }
    // bijectivity on the sampled set (interleave is invertible)
    assert(got.values.toSet.size === pairs.size)
  }

  test("y-band probe: z-order layout touches strictly fewer files than x-major") {
    val s = spark
    import s.implicits._
    // full 64×64 grid, 16 files of 256 rows each
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .withColumn("zkey", ZOrder.interleave(col("x"), col("y"), 6))
      .localCheckpoint()
    def touchedFiles(order: Seq[org.apache.spark.sql.Column]): Long =
      grid.withColumn("f", ntile(16).over(Window.orderBy(order: _*)))
        .groupBy(col("f"))
        .agg(min(col("y")).as("mny"))
        .where(col("mny") <= 7) // band y ∈ [0, 7]
        .count()
    val zTouched = touchedFiles(Seq(col("zkey")))
    val linTouched = touchedFiles(Seq(col("x"), col("y")))
    // x-major: every x-slice contains the y-band → ALL files touched;
    // z-order: the band is 1/8 of the space → a bounded file subset
    assert(linTouched === 16L)
    assert(zTouched < linTouched)
    assert(zTouched <= 8L)
  }
}
