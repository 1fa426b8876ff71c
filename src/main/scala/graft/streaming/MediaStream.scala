package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.sinks.Layout

/** ONLINE media dedup over a maintained pHash band index — the
  * multimodal pillar's incremental face, and the r13 verdict's #2 ask:
  * q216/q218 re-hash the WHOLE media table per run (correct as the
  * one-shot batch face), while a streaming media pipeline must pay
  * per batch only for the batch. The text pillar's discipline
  * ([[CurateStream]]: batches probe the stored band index, the corpus
  * is never re-signed) applies verbatim:
  *
  *   - `media_quarters` (media_id, q0..q3): every KEPT payload's dHash
  *     quarters at the pinned 8×9 grid
  *     ([[graft.functions.MediaExprs]]) — the stored index. The band
  *     projection (4 rows of (media_id, band, key) per signature) is
  *     DERIVED at probe time, exactly like `curate_bands`' 2×2
  *     projection: storing one row per signature keeps the entity at
  *     index-cardinality and the anti-join upsert trivially keyed.
  *   - `media_manifest` (media_id, status, rep_id): one row per
  *     ingested payload with its dedup provenance — q218's statuses
  *     split by representative locality (`dup_corpus` /
  *     `dup_batch` / `kept`), written LAST per batch as the commit
  *     marker.
  *
  * Each ingest costs: ONE fused-codegen hash pass over the batch
  * payloads, one (band, key) equi-join of the batch's bands against
  * the stored index's derived bands, one batch-internal band
  * self-join, and the exact Hamming re-rank on the candidates — all
  * candidate volumes ride the measured `phash_band` law
  * (~bands·n_batch·n_index/2¹⁶ per band), never all-pairs, and the
  * corpus is never re-hashed.
  *
  * Dedup rule (q218's keep-first with [[SemanticStream]]'s provenance
  * split): a batch payload is a duplicate when some payload within
  * Hamming ≤ `maxHamming` is STORED (any id — first-arrival-wins
  * across batches, the [[CurateStream]] deviation note) or is a
  * batch-mate with a SMALLER id; `rep_id` is the least such partner
  * and `status` says whether that representative is corpus or
  * batch-mate. `rep_id` is PROVENANCE, not a transitive root (q135's
  * contract — q221's connected-components face serves canonical
  * roots). Only kept payloads join the quarters index.
  *
  * Replay safety (the foreachBatch retry contract, [[CurateStream]]'s
  * argument verbatim): the stored-index probe EXCLUDES the current
  * batch's own ids, so a half-applied batch (quarters landed,
  * manifest missing) recomputes bit-identical statuses on retry; all
  * writes are [[Layout.upsertStatic]] anti-join upserts (re-landing
  * is a row-wise no-op); the manifest lands last. */
object MediaStream {

  val QuartersEntity = "media_quarters"
  val ManifestEntity = "media_manifest"

  private val QuartersDdl =
    "media_id bigint, q0 bigint, q1 bigint, q2 bigint, q3 bigint"

  private def emptyFrame(s: SparkSession, ddl: String): DataFrame =
    s.createDataFrame(java.util.Collections.emptyList[Row](),
      StructType.fromDDL(ddl))

  private def stored(s: SparkSession, root: String, entity: String,
      ddl: String): DataFrame =
    Layout.readStatic(s, root, entity, recover = true)
      .getOrElse(emptyFrame(s, ddl))

  /** The (media_id, band, key) projection of a quarters frame —
    * derived, like `curate_bands`' projection; 4 rows per signature. */
  private def bandsOf(qs: DataFrame): DataFrame =
    (0 until 4).map(k =>
        qs.select(col("media_id"), lit(k).as("band"), col(s"q$k").as("key")))
      .reduce(_.unionByName(_))

  /** Exact Hamming between two quarter row-sets joined by a candidate
    * pair frame (aId, bId). */
  private def hammingPairs(cand: DataFrame, aQs: DataFrame,
      bQs: DataFrame, aId: String, bId: String): DataFrame = {
    val h = (0 until 4).map(k =>
        bit_count(col(s"a_q$k").bitwiseXOR(col(s"b_q$k"))))
      .reduce(_ + _).cast("long")
    cand
      .join(aQs.toDF((aId +: (0 until 4).map(k => s"a_q$k")): _*), aId)
      .join(bQs.toDF((bId +: (0 until 4).map(k => s"b_q$k")): _*), bId)
      .select(col(aId), col(bId), h.as("hamming"))
  }

  /** Seed the index from an existing media corpus (assumed already
    * deduped: ALL payloads contribute quarters — the
    * [[CurateStream.bootstrap]] contract). Idempotent: the upsert is
    * keyed by media_id. */
  def bootstrap(media: DataFrame, root: String): Unit =
    Layout.upsertStatic(graft.ops.Multimodal.dHashQuarters(media),
      root, QuartersEntity, Seq("media_id"))

  /** Dedup one media batch against the stored quarters index: returns
    * (and lands) the manifest rows, then folds the kept payloads'
    * quarters into the index. Deterministic and replay-idempotent
    * (see object doc). */
  def ingestBatch(batch: DataFrame, root: String,
      maxHamming: Int = 3): DataFrame = {
    val s = batch.sparkSession
    // one fused hash pass over the batch; everything downstream (two
    // band joins, two Hamming re-ranks, the kept fold) reads it
    val qsB = graft.ops.Multimodal.dHashQuarters(batch).localCheckpoint()
    val ids = qsB.select("media_id")

    // probe EXCLUDES this batch's own ids — a replayed half-applied
    // batch must not see its own landed quarters (bit-stable statuses)
    val qsIdx = stored(s, root, QuartersEntity, QuartersDdl)
      .join(ids, Seq("media_id"), "left_anti")

    // corpus partners: ANY stored near-dup (first-arrival-wins across
    // batches); batch partners: SMALLER-id batch-mates (keep-first)
    val candCorpus = bandsOf(qsB).toDF("b_id", "band", "key")
      .join(bandsOf(qsIdx).toDF("c_id", "band", "key"), Seq("band", "key"))
      .select("b_id", "c_id").distinct()
    val corpusPart = hammingPairs(candCorpus, qsB, qsIdx, "b_id", "c_id")
      .where(col("hamming") <= maxHamming)
      .select(col("b_id").as("media_id"), col("c_id").as("pid"),
        lit("corpus").as("tag"))
    val bb = bandsOf(qsB)
    val candBatch = bb.toDF("a_id", "band", "key")
      .join(bb.toDF("b_id", "band", "key"), Seq("band", "key"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val batchPart = hammingPairs(candBatch, qsB, qsB, "a_id", "b_id")
      .where(col("hamming") <= maxHamming)
      .select(col("b_id").as("media_id"), col("a_id").as("pid"),
        lit("batch").as("tag"))

    // rep = the LEAST partner id; its locality decides the status
    // (struct min orders by pid first — corpus and batch ids are
    // disjoint so the tag rides along unambiguously)
    val reps = corpusPart.unionByName(batchPart)
      .groupBy(col("media_id"))
      .agg(min(struct(col("pid"), col("tag"))).as("m"))
      .select(col("media_id"), col("m.pid").as("rep_id"),
        col("m.tag").as("tag"))

    // materialize BEFORE any index write (the manifest's plan reads
    // the stored quarters, which the fold below mutates)
    val manifest = ids
      .join(reps, Seq("media_id"), "left")
      .select(col("media_id"),
        when(col("rep_id").isNull, "kept")
          .when(col("tag") === "corpus", "dup_corpus")
          .otherwise("dup_batch").as("status"),
        col("rep_id"))
      .localCheckpoint()

    // kept quarters first, manifest LAST (the batch's commit marker)
    val kept = manifest.where(col("status") === "kept").select("media_id")
    Layout.upsertStatic(qsB.join(kept, Seq("media_id"), "left_semi"),
      root, QuartersEntity, Seq("media_id"))
    Layout.upsertStatic(manifest, root, ManifestEntity, Seq("media_id"))
    qsB.unpersist()
    manifest
  }

  /** The Structured Streaming driver — [[CurateStream.run]]'s media
    * twin: watch `rawDir` for media batches (parquet in the
    * [[graft.ops.Multimodal.mediaSchema]] shape), dedup each
    * micro-batch against the stored index. Restart-safe for the same
    * reasons (checkpoint replay + self-excluding probes + anti-join
    * upserts + manifest-last). `compactEvery > 0` compacts both
    * entities every that many batches, keyed off the stream's batch
    * id — the per-batch upserts append one small file per entity per
    * batch, and the probe cost follows the file count (the
    * [[CurateStream]] maintenance-window law). */
  def run(spark: SparkSession, rawDir: String, schema: StructType,
      root: String, checkpoint: String, maxFilesPerTrigger: Int = 1,
      maxHamming: Int = 3, compactEvery: Int = 0): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(rawDir)
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        ingestBatch(b, root, maxHamming).unpersist()
        if (compactEvery > 0 && (id + 1) % compactEvery == 0)
          Seq(QuartersEntity, ManifestEntity)
            .foreach(Layout.compactStatic(spark, root, _))
        ()
      }
      .start()
}
