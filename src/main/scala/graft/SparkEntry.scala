package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Registry
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 is registered in
  * [[graft.queries.Registry]] as a named query with (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the FK star join + aggregate (SURVEY §2.4 J3/J4, §2.5 A1). */
  def entry(spark: SparkSession): DataFrame =
    Registry.all("q05_star_join").fn(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (keccak/skeleton UDF queries) → driver records a rows-only check. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
