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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read it as raw nanos (legacy long mode) and convert
    * to a micros TimestampType with integer division — `ts div 1000`
    * stays in Long space (nanos ≈ 1.7e18 would lose precision through a
    * double). DuckDB reads the same file as TIMESTAMP_NS and its
    * epoch_us() truncates identically. The nanosAsLong conf is pinned in
    * [[graft.Sessions]] (session-wide, not a reader side effect). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
