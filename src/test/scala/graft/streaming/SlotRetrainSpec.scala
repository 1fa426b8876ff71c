package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sinks.Layout

/** [[SemanticStream.slotRetrain]] contract — [[RetrainSpec]]'s faces
  * applied to the late-interaction slot sidecar (the r11 verdict gap:
  * the main codebook retrains and JL rotates, but the slot book was
  * frozen at bootstrap forever, with no way to see gather-coverage
  * decay under drift):
  *
  *  1. version bookkeeping — bootstrap tags every slot-cell row with
  *     the slot book's content hash; slotRetrain lands a new book and
  *     retags every row, preserving the (id, pos) set;
  *  2. the drift metric — [[SemanticStream.slotCellImbalance]] reads
  *     the stored slot index's top-cell share (the gather-selectivity
  *     face an operator trends to set the retrain cadence);
  *  3. the crash window — a kill between the book swap and the cells
  *     swap leaves a detectable tag mismatch, and the next slot-face
  *     SERVE rolls the retrain forward: its answers are bit-identical
  *     to a run whose retrain never crashed, and the repair retags the
  *     store as a side effect.
  */
class SlotRetrainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // 4-dim vectors = 2 slots of width 2; slot space clusters A ≈ (1, 0)
  // and B ≈ (0, 1). The seed book (vec 1's two slots) sits entirely on
  // the A side, so a trained retrain MUST move it (new content hash).
  private def df(rows: Seq[(Long, Seq[Double])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def corpus = df(Seq(
    1L -> Seq(1.0, 0.0, 1.0, 0.2),
    2L -> Seq(1.0, 0.1, 0.9, 0.0),
    3L -> Seq(0.0, 1.0, 0.0, 0.9),
    4L -> Seq(0.1, 1.0, 0.0, 1.0),
    5L -> Seq(0.0, 0.9, 0.1, 1.0),
    6L -> Seq(1.0, 0.0, 0.9, 0.1)))

  private def boot(root: String): Unit =
    SemanticStream.bootstrap(corpus, root, k = 2, withSq = true,
      withSlots = true, slotK = 2, slotRounds = 0, slotSlices = 2,
      slotDim = 4)

  private def bookVer(root: String): String =
    SemanticStream.codebookVersion(
      SemanticStream.readSlotBook(spark, root).get._1)

  private def cellsState(root: String): Set[(Long, Int, Long, String)] =
    Layout.readStatic(spark, root, SemanticStream.SlotCellsEntity).get
      .select("id", "pos", "cell", "ver").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSet

  test("bootstrap tags slot cells with the book's hash; retrain retags all") {
    val root = graft.Temps.dir("slot-retrain-tags")
    boot(root)
    val ver0 = bookVer(root)
    val before = cellsState(root)
    assert(before.map(c => (c._1, c._2)).size === 12, "6 docs × 2 slots")
    assert(before.map(_._4) === Set(ver0), "every row carries the seed hash")

    val ver1 = SemanticStream.slotRetrain(spark, root, slotK = 2)
    assert(ver1 !== ver0, "trained book must differ from the A-side seed")
    assert(bookVer(root) === ver1)
    val after = cellsState(root)
    assert(after.map(c => (c._1, c._2)) === before.map(c => (c._1, c._2)),
      "(id, pos) set preserved")
    assert(after.map(_._4) === Set(ver1), "every row retagged")
  }

  test("slotCellImbalance reads the stored slot index's top-cell share") {
    val root = graft.Temps.dir("slot-retrain-imbalance")
    boot(root)
    val rows = cellsState(root).toSeq.groupBy(_._3).map(_._2.size)
    val want = rows.max.toDouble / rows.sum
    assert(SemanticStream.slotCellImbalance(spark, root) === want)
    assert(want > 0.0 && want <= 1.0)
    // retrained book separates the A/B slot clusters 6/6
    SemanticStream.slotRetrain(spark, root, slotK = 2)
    assert(SemanticStream.slotCellImbalance(spark, root) === 0.5)
  }

  test("pre-ver slot store migrates in place instead of crashing") {
    // a store written before the ver column existed (r11 schema) must
    // not hard-fail every slot-face call on the missing column: the
    // repair treats it as torn and reassigns in place (r12 review)
    val s = spark
    import s.implicits._
    val root = graft.Temps.dir("slot-retrain-legacy")
    boot(root)
    val legacy = cellsState(root).toSeq.map(t => (t._1, t._2, t._3))
      .toDF("id", "pos", "cell")
    Layout.replaceStatic(legacy, root, SemanticStream.SlotCellsEntity)
    val res = SemanticStream.queryTopKMaxSimSlots(
        df(Seq(500L -> Seq(0.0, 1.0, 0.0, 1.0))), root, topK = 3,
        prefilterC = 16, slotNProbe = 1)
      .count()
    assert(res > 0)
    assert(cellsState(root).map(_._4) === Set(bookVer(root)),
      "migration retagged every row")
  }

  test("slotRetrainIfUnbalanced: fires on a collapsed batch, stays frozen on a spread one") {
    // the wired trigger (r12 verdict #3): the metric existed
    // (slotCellImbalance), the retrain existed (slotRetrain), and the
    // measured gap said the signal lives at the BATCH face — this case
    // pins the arming. Batch vectors are anti-aligned with the corpus
    // clusters (pairwise cosine ≤ 0 with everything) so dedup keeps
    // them; one vector's slots land in ONE cell (share 1.0 ≥ 0.9 →
    // retrain, new book hash), two mirror vectors spread 50/50
    // (share 0.5 < 0.9 → frozen book).
    val root = graft.Temps.dir("slot-retrain-trigger")
    boot(root)
    val ver0 = bookVer(root)
    val spread = SemanticStream.ingestVectors(
      df(Seq(101L -> Seq(-1.0, 0.0, -1.0, 0.0),
             102L -> Seq(0.0, -1.0, 0.0, -1.0))), root)
    assert(spread.where(col("status") === "kept").count() === 2)
    assert(SemanticStream.slotBatchImbalance(spark, root, spread) === 0.5)
    assert(SemanticStream.slotRetrainIfUnbalanced(spark, root, spread,
      threshold = 0.9, slotK = 2).isEmpty)
    assert(bookVer(root) === ver0, "balanced batch leaves the book frozen")

    // fresh store for the collapse case (in `root` the mirror vectors
    // are already indexed and would dedup the drifted arrival away)
    val root2 = graft.Temps.dir("slot-retrain-trigger2")
    boot(root2)
    val collapsed = SemanticStream.ingestVectors(
      df(Seq(103L -> Seq(-1.0, 0.0, -1.0, 0.0))), root2)
    assert(collapsed.where(col("status") === "kept").count() === 1)
    val share = SemanticStream.slotBatchImbalance(spark, root2, collapsed)
    assert(share === 1.0, s"one vector's slots collapse to one cell: $share")
    val fired = SemanticStream.slotRetrainIfUnbalanced(spark, root2,
      collapsed, threshold = 0.9, slotK = 2)
    assert(fired.nonEmpty, "collapsed batch must fire the retrain")
    assert(fired.get === bookVer(root2))
    assert(fired.get !== ver0)
    assert(cellsState(root2).map(_._4) === Set(fired.get),
      "the fired retrain retagged the whole slot index")
    // no slot sidecar → no-op, not a crash
    val plain = graft.Temps.dir("slot-retrain-trigger-plain")
    SemanticStream.bootstrap(corpus, plain, k = 2)
    val man = SemanticStream.ingestVectors(
      df(Seq(104L -> Seq(-1.0, 0.0, -1.0, 0.0))), plain)
    assert(SemanticStream.slotRetrainIfUnbalanced(spark, plain, man,
      threshold = 0.1).isEmpty)
  }

  test("cadence cap bounds retrain frequency under persistent drift") {
    // r13 verdict #3 mechanized: under persistent degenerate arrival
    // the uncapped trigger fires a full retrain on EVERY drifted
    // batch. With minBatchesBetween = 2 the first fire is immediate
    // (drift onset is never delayed) and subsequent fires wait out
    // the cadence — 5 persistently-drifted batches fire ⌈5/2⌉ = 3
    // retrains, not 5. The share is passed explicitly (the monitoring
    // caller's path) so the case pins the GATE, independent of how
    // the batch happens to dedup.
    val root = graft.Temps.dir("slot-retrain-cadence")
    boot(root)
    val man = SemanticStream.ingestVectors(
      df(Seq(103L -> Seq(-1.0, 0.0, -1.0, 0.0))), root)
    def tick(): Boolean = SemanticStream.slotRetrainIfUnbalanced(
      spark, root, man, threshold = 0.9, slotK = 2,
      share = Some(1.0), minBatchesBetween = 2).nonEmpty
    assert((1 to 5).map(_ => tick()) === Seq(true, false, true, false, true),
      "first fire immediate, then every 2nd drifted batch")
    // and a non-drifted batch consumes cadence without firing
    val root2 = graft.Temps.dir("slot-retrain-cadence2")
    boot(root2)
    def tick2(s: Double): Boolean = SemanticStream.slotRetrainIfUnbalanced(
      spark, root2, man, threshold = 0.9, slotK = 2,
      share = Some(s), minBatchesBetween = 2).nonEmpty
    assert(tick2(1.0), "onset fires")
    assert(!tick2(0.1) && !tick2(0.1), "calm batches never fire")
    assert(tick2(1.0), "drift after the cadence window fires again")
  }

  test("torn bootstrap (book landed, cells never did) repairs instead of memoizing clean") {
    // the OTHER torn-bootstrap shape (r12 advice): a crash between the
    // slot-book and slot-cells upserts leaves a present book over an
    // empty cells entity — the ver-mismatch scan is vacuously clean,
    // and memoizing that verdict would serve zero gather candidates
    // silently for the process lifetime. The repair must treat
    // book-present + cells-empty + inverted-file-nonempty as torn.
    val root = graft.Temps.dir("slot-retrain-emptycells")
    boot(root)
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id bigint, pos int, cell bigint, ver string"))
    Layout.replaceStatic(empty, root, SemanticStream.SlotCellsEntity)
    val res = SemanticStream.queryTopKMaxSimSlots(
        df(Seq(500L -> Seq(0.0, 1.0, 0.0, 1.0))), root, topK = 3,
        prefilterC = 16, slotNProbe = 1)
      .count()
    assert(res > 0, "repair must rebuild the slot cells, not serve zero")
    assert(cellsState(root).map(c => (c._1, c._2)).size === 12,
      "reassignment rebuilt every (id, pos) row")
    assert(cellsState(root).map(_._4) === Set(bookVer(root)))
  }

  test("slotRetrain auto-refreshes a registered forward projection (no caller contract)") {
    // the r13 staleness hole, closed: the forward projection is
    // REGISTERED (ver-tagged meta row), and every entity swap
    // re-lands it — a retrain AFTER the registration leaves the
    // bucketed copy carrying the NEW book's assignments row for row,
    // with no caller-side re-landing
    val root = graft.Temps.dir("slot-fwd-refresh")
    boot(root)
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS slotfwddb LOCATION '" +
      graft.Temps.dir("slot-fwd-db") + "'")
    SemanticStream.writeSlotForward(spark, root, "slotfwddb.fwd", 4)
    SemanticStream.slotRetrain(spark, root, slotK = 2)
    val fwd = graft.sinks.Bucketing.readBucketed(spark, "slotfwddb.fwd")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val inv = cellsState(root).toSeq.map(c => (c._1, c._3)).sorted
    assert(fwd === inv, "post-retrain projection matches the swapped entity")
    // and the refreshed copy passes the read guard under the new book
    val live = bookVer(root)
    assert(SemanticStream.readSlotForward(spark, root, live).isDefined)
  }

  test("stale forward projection is declined, serve falls back to the plain entity") {
    // the ver guard (r13 advice): a meta row recording a DIFFERENT
    // book generation than the live one (the crash window between the
    // cells swap and the projection rebuild) must not be read — the
    // serve path silently (and correctly) uses the plain entity
    val root = graft.Temps.dir("slot-fwd-stale")
    boot(root)
    val s = spark
    import s.implicits._
    s.sql("CREATE DATABASE IF NOT EXISTS slotfwddb LOCATION '" +
      graft.Temps.dir("slot-fwd-db2") + "'")
    SemanticStream.writeSlotForward(spark, root, "slotfwddb.fwd_stale", 4)
    assert(SemanticStream.readSlotForward(spark, root, bookVer(root)).isDefined)
    // simulate the torn refresh: meta pinned to a bogus generation
    Layout.replaceStatic(
      Seq(("slotfwddb.fwd_stale", 4, "deadbeef")).toDF("tbl", "buckets", "ver"),
      root, SemanticStream.SlotForwardMetaEntity)
    assert(SemanticStream.readSlotForward(spark, root, bookVer(root)).isEmpty,
      "stale ver must be declined")
    // serve still answers, identically to a store with no projection
    val plainRoot = graft.Temps.dir("slot-fwd-stale-plain")
    boot(plainRoot)
    def answers(r: String) =
      SemanticStream.queryTopKMaxSimSlots(
          df(Seq(500L -> Seq(0.0, 1.0, 0.0, 1.0))), r, topK = 3,
          prefilterC = 16, slotNProbe = 1, cutC = 2)
        .select("q_id", "rn", "c_id", "maxsim").collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
        .toSet
    assert(answers(root) === answers(plainRoot))
  }

  test("ingest growth stales the projection: count guard declines it and the new doc stays reachable") {
    // the r14 review's failure scenario, pinned: ingestVectors
    // appends slot rows under the UNCHANGED book hash, so a ver-only
    // guard would serve a projection missing the new docs and the
    // armed cut's inner join would silently drop them from results.
    // The count guard must decline the copy; the armed serve then
    // equals the plain serve INCLUDING the newly ingested doc, and a
    // re-land re-arms the projection.
    val root = graft.Temps.dir("slot-fwd-growth")
    val plainRoot = graft.Temps.dir("slot-fwd-growth-plain")
    boot(root); boot(plainRoot)
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS slotfwddb LOCATION '" +
      graft.Temps.dir("slot-fwd-db4") + "'")
    SemanticStream.writeSlotForward(spark, root, "slotfwddb.fwd_growth", 4)
    assert(SemanticStream.readSlotForward(spark, root, bookVer(root)).isDefined)
    // a NEW doc anti-aligned with both corpus clusters (kept by
    // dedup) whose slots still land in the B cell the query probes —
    // so it is GATHERED, and with cutC covering the whole gather the
    // only thing that could drop it from results is the stale
    // projection's inner join (the bug under pin)
    val newDoc = 7L -> Seq(-1.0, 0.0, -1.0, 0.0)
    Seq(root, plainRoot).foreach { r =>
      val man = SemanticStream.ingestVectors(df(Seq(newDoc)), r)
      assert(man.where(col("status") === "kept").count() === 1, r)
      man.unpersist()
    }
    // same book hash, but the projection no longer covers the entity
    assert(SemanticStream.readSlotForward(spark, root, bookVer(root)).isEmpty,
      "count guard must decline the grown entity's stale projection")
    def answers(r: String) =
      SemanticStream.queryTopKMaxSimSlots(
          // query along the new doc's own direction: its probe lands
          // in doc 7's cell, so the gather must include it — any
          // absence from results is the projection-join dropout
          df(Seq(500L -> Seq(-1.0, 0.1, -1.0, 0.0))), r, topK = 6,
          prefilterC = 16, slotNProbe = 2, cutC = 8)
        .select("q_id", "rn", "c_id", "maxsim").collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
        .toSet
    val got = answers(root)
    assert(got === answers(plainRoot), "declined copy → plain-path parity")
    assert(got.exists(_._3 == 7L),
      "the newly ingested doc must be servable — the bug the guard closes")
    // re-landing restores the armed path, bit-identically
    SemanticStream.writeSlotForward(spark, root, "slotfwddb.fwd_growth", 4)
    assert(SemanticStream.readSlotForward(spark, root, bookVer(root)).isDefined)
    assert(answers(root) === got)
  }

  test("forward-armed serve equals plain serve bit for bit (layout-only swap)") {
    val root = graft.Temps.dir("slot-fwd-serve")
    val plainRoot = graft.Temps.dir("slot-fwd-serve-plain")
    boot(root); boot(plainRoot)
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS slotfwddb LOCATION '" +
      graft.Temps.dir("slot-fwd-db3") + "'")
    SemanticStream.writeSlotForward(spark, root, "slotfwddb.fwd_serve", 4)
    def answers(r: String) =
      SemanticStream.queryTopKMaxSimSlots(
          df(Seq(500L -> Seq(0.0, 1.0, 0.0, 1.0))), r, topK = 3,
          prefilterC = 16, slotNProbe = 1, cutC = 2)
        .select("q_id", "rn", "c_id", "maxsim").collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
        .toSet
    val armed = answers(root)
    assert(armed.nonEmpty)
    assert(armed === answers(plainRoot))
  }

  test("kill between book and cells swap: next slot-face serve rolls forward") {
    val clean = graft.Temps.dir("slot-retrain-clean")
    val torn = graft.Temps.dir("slot-retrain-torn")
    boot(clean); boot(torn)
    SemanticStream.slotRetrain(spark, clean, slotK = 2)
    val boom = intercept[RuntimeException] {
      SemanticStream.slotRetrain(spark, torn, slotK = 2,
        afterBookSwap = () => throw new RuntimeException("injected kill"))
    }
    assert(boom.getMessage === "injected kill")
    // torn: new book live, cells still tagged with the seed-era hash
    assert(cellsState(torn).map(_._4) !== Set(bookVer(torn)))

    // the serve path repairs before gathering — answers equal the
    // clean run's, and the repair retagged the cells as a side effect
    def answers(root: String) =
      SemanticStream.queryTopKMaxSimSlots(
          df(Seq(500L -> Seq(0.0, 1.0, 0.0, 1.0))), root, topK = 3,
          prefilterC = 16, slotNProbe = 1)
        .select("q_id", "rn", "c_id", "maxsim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val want = answers(clean)
    assert(want.nonEmpty && want.forall(_._1 == 500L))
    // the B-cluster query's served neighbors are B members
    assert(want.map(_._3).subsetOf(Set(3L, 4L, 5L)), want.toString)
    assert(answers(torn) === want)
    assert(cellsState(torn).map(_._4) === Set(bookVer(torn)),
      "roll-forward retag")
    assert(cellsState(torn) === cellsState(clean))
  }
}
