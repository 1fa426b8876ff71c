package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scale-behavior checks on the partitioned layout: block-bucket
  * partition PRUNING must reach the file index (a filtered read of a
  * 100 TB table must touch only its buckets). */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("dynamic layout prunes partitions on block_bucket filters") {
    import spark.implicits._
    val out = graft.Temps.dir("layout")
    // blocks across 3 buckets (0, 1, 2)
    val rows = Seq(5000L, 15000L, 25000L).flatMap(b =>
      (0 until 10).map(i => (b + i, s"tx$b-$i")))
      .toDF("block_number", "tx_hash")
    Layout.writeDynamic(rows, out, "txs")

    val read = spark.read.parquet(s"$out/dynamic/txs")
      .where(col("block_bucket") === 1L)
    val plan = read.queryExecution.executedPlan.toString
    assert(read.count() === 10)
    // partition filter must appear in the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("block_bucket"), s"no partition pruning in:\n$plan")
    // the scan's file listing only includes bucket 1
    val files = read.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files.map(_.getPath.toString))
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("block_bucket=1")),
      s"unpruned files: $files")
  }

  test("bucket arithmetic: 10k blocks per partition") {
    import spark.implicits._
    val b = Layout.withBlockBucket(Seq(0L, 9999L, 10000L, 123456789L).toDF("block_number"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) === 0L && b(9999L) === 0L && b(10000L) === 1L && b(123456789L) === 12345L)
  }
}
