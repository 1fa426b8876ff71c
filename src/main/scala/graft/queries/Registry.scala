package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark program plus (when expressible)
  * its ANSI-SQL oracle that DuckDB runs over the same parquet tables.
  * Column names MUST match between both (the driver hash-compares after
  * sorting columns by name).
  *
  * Determinism rule for oracles: prefer exact arithmetic — integer counts,
  * decimal-typed sums cast to double at the end, epoch microseconds as
  * BIGINT — so Spark and DuckDB produce bit-identical values regardless of
  * aggregation order. Floating similarity scores are rounded to 6dp on
  * both sides.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object Registry {
  def all: Map[String, Q] =
    Relational.defs ++ EventOps.defs ++ TextOps.defs ++ VectorOps.defs ++
      PqOps.defs ++ SqOps.defs ++ SketchOps.defs ++ ShardOps.defs ++
      RetrievalOps.defs ++ LayoutOps.defs ++
      TraceOps.defs ++
      StreamOps.defs ++ MediaOps.defs ++
      GraphQueries.defs ++ ExternalOps.defs ++ PipelineOps.defs ++
      RpcOps.defs ++ ExtractOps.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql), _)) => k -> sql }
}
