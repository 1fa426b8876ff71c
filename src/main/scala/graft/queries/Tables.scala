package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's benchmark tables (TESTDATA.md). Explicit
  * column pruning happens downstream; parquet scans get filter/column
  * pushdown from Catalyst. */
object Tables {
  /** Memoized per (session, dir, name): repeated reads of the same
    * table (63 registered queries × a handful of tables) otherwise
    * re-list files and re-read parquet footers for schema every time.
    * DataFrames are immutable plans — sharing one is safe. Assumes the
    * dataset directories are static for the life of the session (the
    * driver contract); a directory rewritten mid-session would be served
    * a stale file listing — call [[invalidate]] in that case. */
  private val cache =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

  /** Drop memoized plans (all, or one session's) after a dataset
    * directory is rewritten mid-session. */
  def invalidate(spark: SparkSession = null): Unit =
    if (spark == null) cache.clear()
    else cache.keys.filter(_._1 eq spark).foreach(cache.remove)

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  /** `events.ts` has drifted across testdata generations:
    * TIMESTAMP(NANOS) (which Spark reads as a raw Long under the pinned
    * `nanosAsLong` conf), then TIMESTAMP(MICROS) (arriving as
    * TIMESTAMP_NTZ). A reader hard-coded to either encoding dies at
    * analysis time on the other, so branch on the *scanned* dataType:
    *  - LongType (nanos-as-long era): `ts div 1000` in Long space —
    *    integer division, no double round-trip — then timestamp_micros.
    *  - TimestampNTZType / TimestampType (micros era): cast to session
    *    TimestampType; the session TZ is pinned UTC so NTZ→LTZ is exact
    *    and `epochUs` downstream is unchanged.
    * DuckDB's epoch_us() over either encoding truncates identically, so
    * the oracles need no branch. Encoding-invariance is pinned by
    * TablesSpec (writes the fixture both ways, asserts identical
    * epoch-micros). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet encoding $other — expected " +
            "LongType (TIMESTAMP_NANOS under nanosAsLong) or Timestamp(NTZ); " +
            "extend Tables.events for this encoding")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
