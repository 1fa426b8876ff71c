package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join — point-in-interval matching without
  * the BroadcastNestedLoopJoin Spark falls back to for inequality-only
  * predicates. Intervals explode into the fixed-width time buckets
  * they overlap (bounded fan-out: ceil(len/width)+1 rows per
  * interval); each point carries exactly one bucket; candidates meet
  * in an equi-join on (key, bucket) and the exact range predicate
  * filters them. A point matches an interval in precisely one shared
  * bucket — the point's own — so no post-join dedup is needed.
  *
  * Cost at scale: one shuffle on (key, bucket) with bounded expansion,
  * versus candidate pairs = |left|×|right-per-key| for the nested
  * loop. Width tunes the trade (wider → fewer interval copies,
  * more false candidates; narrower → the reverse). */
object RangeJoin {

  /** @param left      point side; `leftTime` TimestampType
    * @param right     interval side; [`startCol`, `endCol`) half-open
    * @param bucketUs  bucket width in microseconds
    * @param payload   right columns carried onto matches */
  def bandedRangeJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, startCol: String, endCol: String,
      payload: Seq[String], bucketUs: Long): DataFrame = {
    val l = left.withColumn("__b", floor(unix_micros(col(leftTime)) / bucketUs))
      .withColumnRenamed(leftKey, "__k")
    val r = right.select(
      (Seq(col(rightKey).as("__k"),
        col(startCol).cast("timestamp").as("__s"),   // NTZ-tolerant
        col(endCol).cast("timestamp").as("__e")) ++
        payload.map(col)): _*)
      // An empty/inverted interval (__e <= __s) matches no point under
      // the half-open predicate; drop it BEFORE the explode — otherwise
      // sequence() infers a negative step and a badly inverted interval
      // fans out into an unbounded descending bucket list.
      .where(col("__e") > col("__s"))
      .withColumn("__b", explode(sequence(
        floor(unix_micros(col("__s")) / bucketUs),
        floor((unix_micros(col("__e")) - 1) / bucketUs))))
    l.join(r, Seq("__k", "__b"))
      .where(col(leftTime) >= col("__s") && col(leftTime) < col("__e"))
      .withColumnRenamed("__k", leftKey)
      .drop("__b", "__s", "__e")
  }
}
