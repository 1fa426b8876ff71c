package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs

/** Bloom-gated exact-dedup probe: the join-free fast path for "has
  * this key ever entered the corpus?". The gate's contract is
  * EXACTNESS — a Bloom filter admits false positives but never false
  * negatives, so:
  *
  *   batch rows ──might_contain(sketch)──► candidates ──semi-join──► dups
  *                      │ (no)
  *                      └────────────────► provably novel, join skipped
  *
  * yields bit-identically the result of semi-joining every batch row
  * against the full key index, while only the candidate minority
  * (true dups + fpp of the novel rows) pays the shuffle. At a typical
  * ingest mix (≪ 1% true dups, 1% fpp) the confirm join handles ~2%
  * of the batch; the other 98% is settled by a per-row bit test
  * against the broadcast sketch.
  *
  * Sizing (SCALE.md "Bloom probe"): the sketch is ~1.2 B/key at 1%
  * fpp — 10^9 corpus keys ≈ 1.2 GB (a broadcast), 10^10 ≈ 12 GB
  * (shard the sketch by key-range bucket; each probe hits one shard).
  * The confirm join is unchanged either way, so fpp is purely a
  * cost knob, never a correctness one.
  */
object BloomGate {

  /** Flag each batch row whose `keyCol` appears in `corpusKeys` —
    * output equals `batch LEFT SEMI corpusKeys` flags exactly, but
    * only Bloom-positive rows reach the join. */
  def corpusDupFlag(batch: DataFrame, corpusKeys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double, flagCol: String = "is_dup_corpus"): DataFrame = {
    val bf = corpusKeys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val candidates = batch
      .where(BloomExprs.mightContain(bf)(col(keyCol)))
      .select(col(keyCol))
      .join(corpusKeys.select(col(keyCol)), Seq(keyCol), "left_semi")
      .distinct()
      .withColumn(flagCol, lit(true))
    batch.join(candidates, Seq(keyCol), "left")
      .withColumn(flagCol, coalesce(col(flagCol), lit(false)))
  }

  /** The gate's candidate predicate alone (for pipelines that splice
    * it ahead of their own confirm join). */
  def candidate(corpusKeys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): Column =
    BloomExprs.mightContain(
      corpusKeys.stat.bloomFilter(keyCol, expectedItems, fpp))(col(keyCol))
}
