package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — the classic time-series operator Spark has
  * no built-in for. Composed from existing operators (the preferred
  * extension path: compose > custom Expression > custom plan):
  *
  *   1. tag both sides and union them (right rows side=0, left side=1)
  *   2. ONE shuffle: window partitioned by key, ordered by
  *      (time, side) — at equal timestamps right sorts first, giving
  *      inclusive `left.t >= right.t` semantics
  *   3. `last(right_payload, ignoreNulls)` over rows-unbounded-
  *      preceding carries the latest right row forward; left rows then
  *      just read it
  *
  * Versus a range join (`l.k = r.k AND r.t <= l.t` + max_by): no
  * candidate-pair explosion — each row is touched once, the cost is
  * one shuffle + one sorted pass, independent of how many right rows
  * precede each left row. That property is what survives 100 TB;
  * skewed keys shard like any single-key window (salt by time bucket
  * if one key dominates).
  *
  * Duplicate right rows at the same (key, time) are the caller's
  * choice of tie-break: pre-aggregate (e.g. arg_max on a sequence
  * column) for a deterministic result — [[graft.queries.StreamOps]]
  * does exactly that in q52.
  */
object AsOf {

  /** @param payload right-side columns carried onto each left row
    *                (nulls when no right row precedes it). */
  def asofJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      struct(payload.map(col): _*).as("__r"))
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      struct(leftCols.map(col): _*).as("__l"))
    val unioned = r
      .withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .withColumn("__side", lit(0))
      .unionByName(l
        .withColumn("__r", lit(null).cast(r.schema("__r").dataType))
        .withColumn("__side", lit(1))
        .select("__k", "__t", "__l", "__r", "__side"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val out = leftCols.map(c => col(s"__l.$c").as(c)) ++
      payload.map(c => col(s"__m.$c").as(s"asof_$c"))
    carried.select(out: _*)
  }
}
