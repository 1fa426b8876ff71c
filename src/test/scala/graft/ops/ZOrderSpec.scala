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

  test("REAL parquet row-group skipping: z-order layout reads a fraction of x-major") {
    // the end-to-end claim, not the simulation: write the same grid
    // under both layouts (64 sorted range-partitions → 64 parquet
    // files, one row group each), filter on the y-band, and count the
    // records the scan ACTUALLY read via task input metrics — parquet
    // footer min/max stats skip whole row groups only when the layout
    // made the filtered column's per-file range tight
    val s = spark
    import s.implicits._
    val grid = (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y))
      .toDF("x", "y")
      .withColumn("zkey", ZOrder.interleave(col("x"), col("y"), 8))
      .localCheckpoint()
    val zDir = graft.Temps.dir("zorder-parquet")
    val lDir = graft.Temps.dir("linear-parquet")
    grid.repartitionByRange(64, col("zkey")).sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(64, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(lDir)

    def recordsRead(dir: String): Long = {
      val read = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          read.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val matched = spark.read.parquet(dir)
          .where(col("y") >= 0 && col("y") <= 7).count()
        assert(matched === 256L * 8L) // the answer is layout-invariant
        // listener events are async: poll until the counter is stable
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var prev = -1L
        var stable = 0
        while (stable < 6 && System.nanoTime() < deadline) {
          val cur = read.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
          Thread.sleep(50)
        }
        read.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    val zRead = recordsRead(zDir)
    val lRead = recordsRead(lDir)
    // x-major: every file spans the full y extent → no row group can
    // be skipped, the scan reads everything; z-order: each file is a
    // y-tight tile → footer stats skip most row groups
    assert(lRead === 256L * 256L, s"x-major read $lRead")
    assert(zRead < lRead / 2, s"z-order read $zRead of $lRead")
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
