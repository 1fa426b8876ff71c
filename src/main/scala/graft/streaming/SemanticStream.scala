package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ops.SimSearch
import graft.sinks.Layout

/** ONLINE semantic dedup over a maintained IVF index — the vector-side
  * analog of [[CurateStream]] and the online face of q135's SemDeDup
  * shape.
  *
  * The one-shot q135 re-derives the codebook and every cell assignment
  * from the full corpus; at 100 TB the corpus index must be STORED and
  * probed per batch instead:
  *
  *   - `ivf_codebook` (cid, cv, cn): the coarse quantizer — bounded
  *     (K rows), broadcast into every assignment
  *   - `ivf_cells`    (id, cell, v, n): the inverted file — every
  *     kept vector with its cell assignment
  *   - `vec_manifest` (vec_id, cell, status, rep_id): one row per
  *     ingested vector with its dedup provenance, written LAST per
  *     batch as the commit marker
  *
  * Each ingest costs: a zero-shuffle single-pass argmin assignment of
  * the batch ([[SimSearch.ivfAssign]] — K·d codegen arithmetic per
  * row), one equi-join on cell against the stored inverted file, and
  * one batch-internal cell self-join. The corpus is never rescanned
  * and never pairs against itself. The codebook is FROZEN between
  * ingests (standard IVF practice — [[SimSearch.trainCodebook]] is
  * the offline retrain; re-bootstrapping re-assigns, an offline job).
  *
  * Dedup rule (q135's keep-first, extended with provenance): a batch
  * vector is a duplicate when some same-cell vector scores cosine
  * ≥ 0.3 (6-dp rounded) among stored corpus vectors or batch-mates
  * with a SMALLER id; `rep_id` is the least matching id and `status`
  * says whether that representative is corpus (`dup_corpus`) or a
  * batch-mate (`dup_batch`). Only kept vectors join the inverted
  * file. Replay-safe like CurateStream: probes exclude the current
  * batch's own ids, writes are anti-join upserts, manifest last.
  */
object SemanticStream {

  val CodebookEntity = "ivf_codebook"
  val CellsEntity = "ivf_cells"
  val ManifestEntity = "vec_manifest"

  /** q135's duplicate threshold. */
  val DupThreshold = 0.3

  private def emptyFrame(s: SparkSession, ddl: String): DataFrame =
    s.createDataFrame(java.util.Collections.emptyList[Row](),
      StructType.fromDDL(ddl))

  private def stored(s: SparkSession, root: String, entity: String,
      ddl: String): DataFrame =
    Layout.readStatic(s, root, entity, recover = true)
      .getOrElse(emptyFrame(s, ddl))

  /** Seed the index from an existing corpus: id-seeded codebook
    * (K lowest-id vectors — swap in [[SimSearch.trainCodebook]]'s
    * output for production recall) and the corpus's cell assignments.
    * Idempotent. */
  def bootstrap(corpus: DataFrame, root: String, k: Int = SimSearch.IvfK,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = SimSearch.ivfCentroids(corpus, idCol, vecCol, k)
    Layout.upsertStatic(cents, root, CodebookEntity, Seq("cid"))
    val cb = SimSearch.collectCodebook(cents)
    val cells = SimSearch.ivfAssign(corpus, idCol, vecCol, cb, p = 1)
      .select(col("id"),
        element_at(col("probes"), 1).getField("cid").as("cell"),
        col("v"), col("n"))
    Layout.upsertStatic(cells, root, CellsEntity, Seq("id"))
  }

  /** Dedup one vector batch against the stored index; returns (and
    * lands) the manifest, then folds kept vectors into the inverted
    * file. Deterministic and replay-idempotent. */
  def ingestVectors(batch0: DataFrame, root: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = batch0.sparkSession
    val batch = batch0.localCheckpoint()
    val cb = SimSearch.collectCodebook(
      stored(s, root, CodebookEntity, "cid bigint, cv array<double>, cn double"))
    require(cb.nonEmpty, s"no codebook under $root — bootstrap first")
    // zero-shuffle assignment of the batch against the frozen codebook
    val asg = SimSearch.ivfAssign(batch, idCol, vecCol, cb, p = 1)
      .select(col("id").as("vec_id"),
        element_at(col("probes"), 1).getField("cid").as("cell"),
        col("v"), col("n"))
      .localCheckpoint()
    val ids = asg.select(col("vec_id").as("id"))
    // the inverted file, minus this batch's own (possibly half-landed
    // on a replay) rows
    val corpusCells = stored(s, root, CellsEntity,
        "id bigint, cell bigint, v array<double>, n double")
      .join(ids, Seq("id"), "left_anti")
    val a = asg.toDF("vec_id", "cell", "av", "an")
    val corpusMatches = a
      .join(corpusCells.toDF("c_id", "cell", "cv", "cn"), Seq("cell"))
      .where(round(SimSearch.cosine(col("av"), col("cv"), col("an"),
        col("cn")), 6) >= DupThreshold)
      .select(col("vec_id"), col("c_id").as("m_id"), lit(1).as("fc"))
    val batchMatches = a
      .join(asg.toDF("b_id", "cell", "bv", "bn"), Seq("cell"))
      .where(col("b_id") < col("vec_id"))
      .where(round(SimSearch.cosine(col("av"), col("bv"), col("an"),
        col("bn")), 6) >= DupThreshold)
      .select(col("vec_id"), col("b_id").as("m_id"), lit(0).as("fc"))
    // keep-first: the least matching id is the representative; its
    // provenance decides the status
    val reps = corpusMatches.unionByName(batchMatches)
      .groupBy("vec_id")
      .agg(min(col("m_id")).as("rep_id"),
        expr("min_by(fc, m_id)").as("fc"))
    val manifest = asg.select("vec_id", "cell")
      .join(reps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("rep_id").isNull, "kept")
          .when(col("fc") === 1, "dup_corpus")
          .otherwise("dup_batch").as("status"),
        col("rep_id"))
      .localCheckpoint() // materialize before the index writes below
    val kept = manifest.where(col("status") === "kept")
      .select(col("vec_id").as("id"))
    Layout.upsertStatic(
      asg.toDF("id", "cell", "v", "n").join(kept, Seq("id"), "left_semi"),
      root, CellsEntity, Seq("id"))
    Layout.upsertStatic(manifest, root, ManifestEntity, Seq("vec_id"))
    manifest
  }
}
