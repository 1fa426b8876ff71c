package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout: the co-located-join path for the big fact
  * tables (SURVEY §4 "join order/broadcast" row; the 100-TB design
  * lever the reference can't express). Writing both sides of a hot
  * join bucketed (and sorted) by the join key means every subsequent
  * join/aggregate on that key runs with NO shuffle exchange — the scan
  * partitioning already satisfies the required distribution, which is
  * exactly "reuse a partitioning across stages".
  *
  * Plain parquet directories can't carry bucket metadata, so these go
  * through the session catalog (`saveAsTable`); `database` lets tests
  * and tools point the storage anywhere via `CREATE DATABASE ...
  * LOCATION`. */
object Bucketing {

  /** Write `df` bucketed+sorted by `key` into the catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket spec rides along from the
    * catalog — downstream joins/aggs on the bucket key skip their
    * exchange when both sides share the bucket count). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
