package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sinks.Layout

/** [[SemanticStream.retrain]] contract, three faces:
  *
  *  1. the functional payoff — a near-dup pair that the id-seeded
  *     codebook splits across cells (dup MISSED) is caught after
  *     retrain re-fits the centroids to the true clusters;
  *  2. version bookkeeping — retrain retags codebook + every cell row
  *     with the new content-hash version, preserving ids/vectors;
  *  3. the crash window — a kill between the codebook swap and the
  *     cells swap leaves a detectable ver mismatch, and the next
  *     ingest ROLLS THE RETRAIN FORWARD: its manifest and final index
  *     state are bit-identical to a run whose retrain never crashed.
  */
class RetrainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def vec(parts: (Int, Double)*): Seq[Double] = {
    val a = Array.fill(6)(0.0)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // Both codebook seeds (the 2 lowest ids) sit in cluster A around e0,
  // so the seeded quantizer cannot separate cluster B around e2 — the
  // drift scenario in miniature (the stored codebook no longer fits
  // the accumulated corpus).
  private def corpus = df(Seq(
    1L -> vec(0 -> 1.0),              // cluster A (seed 1)
    2L -> vec(0 -> 1.0, 1 -> 0.1),    // cluster A (seed 2)
    3L -> vec(2 -> 1.0),              // cluster B
    4L -> vec(0 -> 0.2, 2 -> 1.0),    // cluster B — the twin's nearest
    5L -> vec(2 -> 1.0, 4 -> 0.3)))   // cluster B

  // Near-twin of corpus 4 (cos ≈ 0.97) nudged with an e1 component so
  // the SEEDED codebook assigns it to the other seed's cell than 4.
  private def batch = df(Seq(100L -> vec(0 -> 0.2, 1 -> 0.25, 2 -> 1.0)))

  private def status(root: String): Map[Long, (String, Long)] = {
    val man = Layout.readStatic(spark, root, SemanticStream.ManifestEntity).get
    man.select("vec_id", "status", "rep_id").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
  }

  private def cellsState(root: String): Set[(Long, Long, String)] = {
    val c = Layout.readStatic(spark, root, SemanticStream.CellsEntity).get
    c.select("id", "cell", "ver").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
  }

  private def codebookVer(root: String): String =
    Layout.readStatic(spark, root, SemanticStream.CodebookEntity).get
      .select("ver").distinct().collect().map(_.getString(0)) match {
      case Array(v) => v
      case vs => fail(s"codebook carries ${vs.length} versions: ${vs.toSeq}")
    }

  test("seeded codebook misses the cross-cell near-dup; retrain catches it") {
    // control: no retrain — seeds can't separate cluster B, the twin
    // lands in a different cell than its rep and is wrongly kept
    val ctl = graft.Temps.dir("retrain-control")
    SemanticStream.bootstrap(corpus, ctl, k = 2)
    SemanticStream.ingestVectors(batch, ctl)
    assert(status(ctl)(100L)._1 === "kept",
      "fixture geometry: the seeded codebook was supposed to split the pair")

    // retrained: centroids move to the true cluster means, the twin
    // shares cluster B's cell with 3/4/5 → dup_corpus, rep = least id
    val root = graft.Temps.dir("retrain-happy")
    SemanticStream.bootstrap(corpus, root, k = 2)
    val ver = SemanticStream.retrain(spark, root, k = 2)
    assert(codebookVer(root) === ver)
    val cells = cellsState(root)
    assert(cells.map(_._1) === Set(1L, 2L, 3L, 4L, 5L), "ids preserved")
    assert(cells.map(_._3) === Set(ver), "every cell row retagged")
    SemanticStream.ingestVectors(batch, root)
    assert(status(root)(100L) === ("dup_corpus", 3L)) // keep-first: least same-cell match
  }

  test("imbalance: index metric reads the store; batch trigger fires on degenerate arrivals") {
    val root = graft.Temps.dir("retrain-trigger")
    SemanticStream.bootstrap(corpus, root, k = 2)
    // seeded codebook lumps cluster B plus seed 1 into one cell: 4/5
    assert(SemanticStream.cellImbalance(spark, root) === 0.8)
    SemanticStream.retrain(spark, root, k = 2)
    assert(SemanticStream.cellImbalance(spark, root) === 0.6)

    // spread batch lands across both trained cells (share 2/3 < 0.7):
    // the mechanized policy stays calm
    val spread = df(Seq(
      200L -> vec(0 -> 1.0, 3 -> 0.2),
      210L -> vec(2 -> 1.0, 4 -> 0.2),
      220L -> vec(2 -> 1.0, 5 -> 0.2)))
    val mSpread = SemanticStream.ingestVectors(spread, root)
    assert(SemanticStream.batchImbalance(mSpread) < 0.7)
    assert(SemanticStream
      .retrainIfUnbalanced(spark, root, mSpread, 0.7, k = 2).isEmpty)

    // degenerate batch (all one cluster → one cell, share 1.0) fires
    val degen = df(Seq(
      300L -> vec(2 -> 1.0, 3 -> 0.31),
      310L -> vec(2 -> 1.0, 4 -> 0.31),
      320L -> vec(2 -> 1.0, 5 -> 0.31)))
    val mDegen = SemanticStream.ingestVectors(degen, root)
    assert(SemanticStream.batchImbalance(mDegen) === 1.0)
    assert(SemanticStream
      .retrainIfUnbalanced(spark, root, mDegen, 0.7, k = 2).nonEmpty)
  }

  test("probes=2 catches the straddled pair WITHOUT retraining") {
    // the other remedy for the same miss (the round-7 drift rehearsal's
    // finding: probe count, not retraining, is the dup-recall lever):
    // keep the bad seeded codebook, widen the batch's probe list to its
    // top-2 cells — the partner's cell is the twin's runner-up, so the
    // pair meets and dedups identically to the retrained run
    val root = graft.Temps.dir("retrain-probe2")
    SemanticStream.bootstrap(corpus, root, k = 2)
    SemanticStream.ingestVectors(batch, root, probes = 2)
    assert(status(root)(100L) === ("dup_corpus", 3L))
  }

  test("kill between codebook and cells swap: next ingest rolls forward") {
    val root = graft.Temps.dir("retrain-torn")
    SemanticStream.bootstrap(corpus, root, k = 2)
    val boom = intercept[RuntimeException] {
      SemanticStream.retrain(spark, root, k = 2,
        afterCodebookSwap = () => throw new RuntimeException("injected kill"))
    }
    assert(boom.getMessage === "injected kill")
    // torn: new codebook live, cells still tagged with the old version
    val newVer = codebookVer(root)
    assert(cellsState(root).map(_._3) !== Set(newVer))

    // the next ingest repairs before probing — and must land EXACTLY
    // the state of a run whose retrain never crashed
    val man = SemanticStream.ingestVectors(batch, root)
    assert(cellsState(root).map(_._3) === Set(newVer), "roll-forward retag")
    assert(status(root)(100L) === ("dup_corpus", 3L)) // keep-first: least same-cell match

    val clean = graft.Temps.dir("retrain-clean")
    SemanticStream.bootstrap(corpus, clean, k = 2)
    SemanticStream.retrain(spark, clean, k = 2)
    SemanticStream.ingestVectors(batch, clean)
    assert(cellsState(root) === cellsState(clean))
    assert(status(root) === status(clean))
    assert(man.columns.toSeq ===
      Seq("vec_id", "cell", "status", "rep_id"), "manifest schema stable")
  }

  test("queryTopK serves the stored index and repairs a torn retrain first") {
    def answers(root: String) =
      SemanticStream.queryTopK(
          df(Seq(500L -> vec(2 -> 1.0, 0 -> 0.1))), root, topK = 2, nProbe = 1)
        .select("q_id", "rn", "c_id", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq

    // two identical index histories: bootstrap + retrain + ingest of a
    // KEPT vector (orthogonal e4 — no same-cell match), so the second
    // retrain below trains on a grown corpus and lands a NEW codebook
    // version (a no-op retrain would leave no torn window to test)
    def seeded(): String = {
      val root = graft.Temps.dir("query-root")
      SemanticStream.bootstrap(corpus, root, k = 2)
      SemanticStream.retrain(spark, root, k = 2)
      SemanticStream.ingestVectors(df(Seq(100L -> vec(4 -> 1.0))), root)
        .unpersist()
      root
    }
    val clean = seeded()
    val torn = seeded()
    // ...diverge at a SECOND retrain: clean completes, torn is killed
    // between the codebook and cells swaps
    SemanticStream.retrain(spark, clean, k = 2)
    intercept[RuntimeException] {
      SemanticStream.retrain(spark, torn, k = 2,
        afterCodebookSwap = () => throw new RuntimeException("injected kill"))
    }
    assert(cellsState(torn).map(_._3) !== Set(codebookVer(torn)), "torn")
    // the read path repairs before serving: answers equal the clean
    // run's, and the repair retagged the cells as a side effect
    val want = answers(clean)
    assert(want.nonEmpty && want.forall(_._1 == 500L))
    // the query vector sits in cluster B: every served neighbor is a B
    // member from its one probed cell, ranked by exact cosine
    assert(want.map(_._3).forall(Set(3L, 4L, 5L)), want.toString)
    assert(answers(torn) === want)
    assert(cellsState(torn).map(_._3) === Set(codebookVer(torn)))
  }

  test("PQ sidecar: a wide prefilter serves exactly the uncompressed read path") {
    // prefilterC ≥ every probed cell's population ⇒ the ADC stage
    // passes all candidates through and the exact re-rank must equal
    // queryTopK bit for bit — the equivalence that makes prefilterC a
    // pure recall/IO knob, never a correctness one
    val root = graft.Temps.dir("query-pq")
    SemanticStream.bootstrap(corpus, root, k = 2,
      withPq = true, pqM = 3, pqKsub = 4)
    SemanticStream.ingestVectors(df(Seq(100L -> vec(4 -> 1.0))), root)
      .unpersist()
    val q = df(Seq(
      500L -> vec(2 -> 1.0, 0 -> 0.1),
      510L -> vec(0 -> 1.0, 3 -> 0.1)))
    def rows(res: org.apache.spark.sql.DataFrame) =
      res.select("q_id", "rn", "c_id", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val exact = rows(SemanticStream.queryTopK(q, root, topK = 2, nProbe = 2))
    val pq = rows(SemanticStream.queryTopKPq(q, root, topK = 2,
      prefilterC = 100, nProbe = 2))
    assert(exact.nonEmpty)
    assert(pq === exact)
    // prefilterC bounds the full-vector fetches: at C = 1 each query
    // re-ranks (and can return) at most one candidate
    val narrow = rows(SemanticStream.queryTopKPq(q, root, topK = 2,
      prefilterC = 1, nProbe = 2))
    assert(narrow.nonEmpty)
    assert(narrow.groupBy(_._1).forall(_._2.size <= 1))
  }

  test("SQ sidecar: a wide prefilter serves exactly the uncompressed read path") {
    // the training-free twin of the PQ equivalence above: grid frozen
    // at bootstrap, kept ingest encodes under it (out-of-grid values
    // round unclamped), and prefilterC ≥ cell population ⇒ the
    // asymmetric stage passes everything to the exact re-rank
    val root = graft.Temps.dir("query-sq")
    SemanticStream.bootstrap(corpus, root, k = 2, withSq = true)
    SemanticStream.ingestVectors(df(Seq(100L -> vec(4 -> 1.0))), root)
      .unpersist()
    val q = df(Seq(
      500L -> vec(2 -> 1.0, 0 -> 0.1),
      510L -> vec(0 -> 1.0, 3 -> 0.1)))
    def rows(res: org.apache.spark.sql.DataFrame) =
      res.select("q_id", "rn", "c_id", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val exact = rows(SemanticStream.queryTopK(q, root, topK = 2, nProbe = 2))
    val sq = rows(SemanticStream.queryTopKSq(q, root, topK = 2,
      prefilterC = 100, nProbe = 2))
    assert(exact.nonEmpty)
    assert(sq === exact)
    val narrow = rows(SemanticStream.queryTopKSq(q, root, topK = 2,
      prefilterC = 1, nProbe = 2))
    assert(narrow.nonEmpty)
    assert(narrow.groupBy(_._1).forall(_._2.size <= 1))
  }

  test("retrainPressure: predicts the retrain exactly, mutates nothing, zero after") {
    val root = graft.Temps.dir("retrain-pressure")
    SemanticStream.bootstrap(corpus, root, k = 2)
    val before = cellsState(root)
    val p1 = SemanticStream.retrainPressure(spark, root, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // conservation: every stored vector counted exactly once
    assert(p1.values.map(_._1).sum === before.size.toLong)
    // the drift fixture: both seeds sit in cluster A, so the audit
    // must report pressure (retrain WOULD move cluster B)
    assert(p1.values.map(_._2).sum > 0L)
    // read-only: the audit never touches the store
    assert(cellsState(root) === before)

    // the audit IS the retrain's prediction: per old cell, n_moved
    // equals the ids whose assignment actually changes when retrain
    // runs with the same trainer knobs
    SemanticStream.retrain(spark, root, k = 2)
    val after = cellsState(root).map(c => c._1 -> c._2).toMap
    val movedByOldCell = before.toSeq
      .filter { case (id, cell, _) => after(id) != cell }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    p1.foreach { case (cell, (_, nMoved)) =>
      assert(movedByOldCell.getOrElse(cell, 0L) === nMoved,
        s"cell $cell: audit predicted $nMoved moves")
    }

    // immediately after the retrain it predicted, pressure is zero:
    // the audit fits the same codebook retrain installs
    val p2 = SemanticStream.retrainPressure(spark, root, k = 2).collect()
    assert(p2.map(_.getLong(1)).sum === before.size.toLong)
    assert(p2.forall(_.getLong(2) === 0L))
  }
}
