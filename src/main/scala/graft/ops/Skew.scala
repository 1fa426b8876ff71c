package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/group keys — the manual fallback when
  * AQE's skew-join split isn't applicable (e.g. the skew is in a
  * broadcast-too-big dimension, or a first-shuffle aggregation).
  *
  * Salting: the probe (skewed) side gets a deterministic salt in
  * [0, buckets); the build side is replicated once per salt value; the
  * join key becomes (key, salt), spreading each hot key over `buckets`
  * reducers. Deterministic salt (hash of full row keys, not rand()) so
  * retried tasks produce identical output — rand() would break
  * speculative execution and recomputed-stage correctness.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with `big`'s hot keys spread over
    * `buckets` partitions. `small` is replicated `buckets`× — use for
    * medium dimensions where one copy per reducer is still cheap but a
    * plain shuffle join would hotspot. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltSource: Column): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation with an explicit salt: groupBy (key, salt) →
    * partial aggregate → groupBy key → merge. Spark's hash aggregate
    * already does map-side partials, but when a single key dominates a
    * dataset the FINAL shuffle still lands that key on one reducer —
    * pre-salting bounds any reducer's share to 1/buckets of the hot key.
    * `partials` maps column → (partial agg, merge agg). */
  def saltedCount(df: DataFrame, key: String, buckets: Int,
      saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))
}
