package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Late-interaction MaxSim contract ([[LateInteraction]]): slicing
  * reconstructs the vector, an exact duplicate scores the per-slot
  * maximum on every slot (maxsim = slices), scores are bounded by the
  * slot count, and a corpus-covering prefilter makes the bounded
  * re-rank identical to the unbounded one. */
class LateInteractionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val Dim = 64

  /** Deterministic synthetic vectors: component j of vector i from the
    * same LCG family the LSH planes use — nothing special about the
    * values beyond being fixed and non-degenerate. */
  private def comp(i: Int, j: Int): Double =
    SimSearch.planeComponent(i * 7 + 1, j)

  private def vecs = {
    val s = spark
    import s.implicits._
    val rows = (0 until 24).map { i =>
      (i.toLong, (0 until Dim).map(j => comp(i, j)))
    } :+ (100L, (0 until Dim).map(j => comp(3, j))) // 100 duplicates 3
    rows.toDF("vec_id", "embedding")
  }

  test("multiVec slices reconstruct the original vector in pos order") {
    val s = spark
    import s.implicits._
    val back = LateInteraction.multiVec(vecs, "vec_id", "embedding")
      .groupBy(col("id"))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("sv")))
        .cast("array<struct<pos:int,sv:array<double>>>"))
        .getField("sv")).as("rebuilt"))
    val orig = vecs.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val mismatches = back.join(orig, Seq("id"))
      .where(col("rebuilt") =!= col("v")).count()
    assert(mismatches === 0)
    // and each id yields exactly Slices sub-vectors of Dim/Slices dims
    val shapes = LateInteraction.multiVec(vecs, "vec_id", "embedding")
      .groupBy(col("id")).agg(count(lit(1)).as("n"),
        min(size(col("sv"))).as("w1"), max(size(col("sv"))).as("w2"))
      .where(col("n") =!= LateInteraction.Slices ||
        col("w1") =!= Dim / LateInteraction.Slices ||
        col("w2") =!= Dim / LateInteraction.Slices)
    assert(shapes.count() === 0)
  }

  test("an exact duplicate scores maxsim = Slices and ranks first") {
    val top = LateInteraction.maxSimTopK(
      vecs.where(col("vec_id") === 3), vecs, "vec_id", "embedding",
      k = 3, prefilterC = 8).orderBy(col("rn")).collect()
    assert(top.head.getLong(2) === 100L) // the duplicate of 3
    assert(math.abs(top.head.getDouble(3) - LateInteraction.Slices) < 1e-9)
    // every score is bounded by the slot count (each slot cos ≤ 1)
    assert(top.forall(_.getDouble(3) <= LateInteraction.Slices + 1e-9))
  }

  test("corpus-covering prefilter ≡ unbounded MaxSim (the bound only prunes)") {
    val q = vecs.where(col("vec_id") < 4)
    val bounded = LateInteraction.maxSimTopK(
      q, vecs, "vec_id", "embedding", k = 5, prefilterC = 1000)
    val viaSmallC = LateInteraction.maxSimTopK(
      q, vecs, "vec_id", "embedding", k = 5, prefilterC = 25)
    // C = corpus size: both candidate sets cover everything, so the
    // re-ranked top-5 must agree row for row
    assert(bounded.exceptAll(viaSmallC).count() === 0)
    assert(viaSmallC.exceptAll(bounded).count() === 0)
  }

  test("served face at covering knobs ≡ brute MaxSim (index only bounds, never reorders)") {
    import graft.streaming.SemanticStream
    val root = graft.Temps.dir("maxsim-served-spec")
    SemanticStream.bootstrap(vecs, root, withSq = true)
    val q = vecs.where(col("vec_id") < 4)
    // full probe (nProbe = IvfK) + corpus-covering C: the SQ candidate
    // stage admits every non-self pair, so the served cascade must
    // reproduce the brute one row for row — the maintained index is a
    // pure candidate bound on the same deterministic re-rank
    val served = SemanticStream.queryTopKMaxSim(q, root, topK = 5,
      prefilterC = 100, nProbe = SimSearch.IvfK)
    val brute = LateInteraction.maxSimTopK(
      q, vecs, "vec_id", "embedding", k = 5, prefilterC = 100)
    assert(served.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(served).count() === 0)
  }

  test("slot face at covering knobs ≡ brute MaxSim (slot stage-1 only bounds)") {
    import graft.streaming.SemanticStream
    val root = graft.Temps.dir("maxsim-slots-spec")
    SemanticStream.bootstrap(vecs, root, withSq = true, withSlots = true, slotK = 8)
    val q = vecs.where(col("vec_id") < 4)
    // every slot cell probed (slotNProbe = slotK) + covering C: every
    // non-self (doc, slot) matches, the stage-1 estimate IS the full
    // MaxSim, and the re-rank must reproduce the brute result row for
    // row — the slot index is a pure candidate bound
    val served = SemanticStream.queryTopKMaxSimSlots(q, root, topK = 5,
      prefilterC = 100, slotNProbe = 8)
    val brute = LateInteraction.maxSimTopK(
      q, vecs, "vec_id", "embedding", k = 5, prefilterC = 100)
    assert(served.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(served).count() === 0)
  }

  test("slot stage-1 surfaces an exact duplicate at minimal knobs") {
    import graft.streaming.SemanticStream
    val root = graft.Temps.dir("maxsim-slots-dup-spec")
    SemanticStream.bootstrap(vecs, root, withSq = true, withSlots = true, slotK = 8)
    // vec 100 duplicates vec 3: identical slot vectors land in
    // identical slot cells, so even at slotNProbe = 1 every slot of
    // the duplicate matches the query's probes and its stage-1 score
    // is the maximum — the candidate union reaches it where a pooled
    // prefilter would have to get lucky
    val top = SemanticStream.queryTopKMaxSimSlots(
      vecs.where(col("vec_id") === 3), root, topK = 3,
      prefilterC = 4, slotNProbe = 1).orderBy(col("rn")).collect()
    assert(top.head.getLong(2) === 100L)
    assert(math.abs(top.head.getDouble(3) - LateInteraction.Slices) < 1e-9)
  }

  test("filtered slot face: covering knobs ≡ brute MaxSim over the eligible corpus only") {
    import graft.streaming.SemanticStream
    val root = graft.Temps.dir("maxsim-slots-filtered-spec")
    SemanticStream.bootstrap(vecs, root, withSq = true, withSlots = true, slotK = 8)
    val q = vecs.where(col("vec_id") < 4)
    val allowed = vecs.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"))
    val served = SemanticStream.queryTopKMaxSimSlots(q, root, topK = 5,
      prefilterC = 100, slotNProbe = 8, allowed = Some(allowed))
    // eligibility is a PRE-gather constraint: every result is allowed,
    // and at covering knobs the face reproduces brute MaxSim computed
    // over the eligible corpus alone
    assert(served.where(pmod(col("c_id"), lit(2)) =!= 0).count() === 0)
    val brute = LateInteraction.maxSimTopK(
      q, vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
      k = 5, prefilterC = 100)
    assert(served.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(served).count() === 0)
  }

  test("ingest maintains the slot sidecar: kept docs land slot rows, replay is a no-op") {
    import graft.streaming.SemanticStream
    val s = spark
    import s.implicits._
    val root = graft.Temps.dir("maxsim-slots-ingest-spec")
    SemanticStream.bootstrap(vecs, root, withSq = true, withSlots = true, slotK = 8)
    val batch = Seq(
      (200L, (0 until Dim).map(j => comp(40, j))), // novel — kept
      (201L, (0 until Dim).map(j => comp(3, j)))   // duplicate of 3
    ).toDF("vec_id", "embedding")
    val man = SemanticStream.ingestVectors(batch, root)
    val kept = man.where(col("status") === "kept")
      .select("vec_id").as[Long].collect().toSet
    val slotRows = graft.sinks.Layout
      .readStatic(s, root, SemanticStream.SlotCellsEntity).get
    val landed = slotRows.where(col("id") >= 200L)
      .select("id").distinct().as[Long].collect().toSet
    assert(landed === kept) // dup docs land no slot rows
    assert(slotRows.where(col("id") >= 200L).count()
      === kept.size.toLong * LateInteraction.Slices)
    val before = slotRows.count()
    SemanticStream.ingestVectors(batch, root) // replay
    assert(graft.sinks.Layout
      .readStatic(s, root, SemanticStream.SlotCellsEntity).get.count()
      === before)
  }
}
