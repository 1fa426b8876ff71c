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

  /** The header doc's 10^10-key shape, implemented: S key-hash shards,
    * built GROUPED in one shuffle — `groupByKey(pmod(xxhash64(key), S))
    * .mapGroups` fills each shard's filter on the executor that owns
    * its partition, so no single filter ever needs the whole key set's
    * bits in one place and the driver never `mergeInPlace`s giant
    * bitsets (filter bits are an OR of per-key insertions —
    * insertion-order independent, hence deterministic given the
    * routing). Missing shards (no keys routed) get an empty filter:
    * every probe of them is provably novel. */
  def buildShards(corpusKeys: DataFrame, keyCol: String, shards: Int,
      expectedItems: Long, fpp: Double): Seq[graft.functions.SketchBytes] = {
    val spark = corpusKeys.sparkSession
    import spark.implicits._
    val perShard = math.max(expectedItems / shards, 1L)
    // route on the CAST key: the probe expression hashes the string
    // value (UTF8String), so the build must hash the identical string
    // — routing on the raw column would diverge for non-string keyCols
    // and give the gate false negatives
    val built = corpusKeys
      .select(pmod(xxhash64(col(keyCol).cast("string")), lit(shards))
          .cast("int").as("s"),
        col(keyCol).cast("string").as("k"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroups { (s, it) =>
        val bf = org.apache.spark.util.sketch.BloomFilter.create(perShard, fpp)
        it.foreach(t =>
          bf.putBinary(t._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        (s, BloomExprs.serialize(bf))
      }
      .collect().toMap
    lazy val empty = BloomExprs.serialize(
      org.apache.spark.util.sketch.BloomFilter.create(perShard, fpp))
    (0 until shards).map(i =>
      graft.functions.SketchBytes(built.getOrElse(i, empty)))
  }

  /** Shard-local gate over a built shard set: the rows of `df` whose
    * `keyCol` the sketch might contain, planned as a UNION of one
    * branch per shard — branch i filters `pmod(xxhash64(key), S) = i
    * AND might_contain(shard_i)`, so each branch's task closure
    * carries ONLY that shard's filter bytes. A single expression
    * holding all S images would make every task materialize the whole
    * sketch (at the 10^10-key scale this section sizes, ~12 GB per
    * executor — exactly the monolith problem sharding exists to
    * solve); the union shape keeps per-task memory to one shard.
    * Routing is the build's own hash (no false negatives), and the
    * branches partition the rows, so the union is duplicate-free. */
  def shardedGate(df: DataFrame, sk: Seq[graft.functions.SketchBytes],
      keyCol: String): DataFrame = {
    val route = pmod(xxhash64(col(keyCol).cast("string")),
      lit(sk.length)).cast("int")
    sk.zipWithIndex.map { case (bytes, i) =>
      df.where(route === i &&
        BloomExprs.mightContainBytes(bytes)(col(keyCol).cast("string")))
    }.reduce(_ unionByName _)
  }

  /** [[corpusDupFlag]] probing a sharded sketch — bit-identical
    * output (the gate never decides, the confirm join does); the
    * sharding only re-shapes WHERE the filter bits live, and the
    * [[shardedGate]] union keeps each probe task to one shard image. */
  def shardedCorpusDupFlag(batch: DataFrame, corpusKeys: DataFrame,
      keyCol: String, shards: Int, expectedItems: Long, fpp: Double,
      flagCol: String = "is_dup_corpus"): DataFrame = {
    val sk = buildShards(corpusKeys, keyCol, shards, expectedItems, fpp)
    val candidates = shardedGate(batch, sk, keyCol)
      .select(col(keyCol))
      .join(corpusKeys.select(col(keyCol)), Seq(keyCol), "left_semi")
      .distinct()
      .withColumn(flagCol, lit(true))
    batch.join(candidates, Seq(keyCol), "left")
      .withColumn(flagCol, coalesce(col(flagCol), lit(false)))
  }
}
