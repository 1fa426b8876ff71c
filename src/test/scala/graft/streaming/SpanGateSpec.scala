package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sinks.Layout

/** The span layer of [[CurateStream.ingestBatch]] (q147): a
  * FRANKEN-DOC recomposed from two corpus docs' token runs shares no
  * full text (exact layer passes it) and too few shingles with either
  * source for the MinHash bands to agree (near layer passes it), but
  * ≥ [[CurateStream.SpanDupFrac]] of its 8-token spans exist verbatim
  * in the stored span index — `dup_span_corpus`. Also pins: a doc
  * under the coverage threshold is kept; kept docs fold their spans in
  * (a batch-2 doc recomposed from a batch-1 KEEPER's runs is caught);
  * and replay is a row-wise no-op with identical statuses. */
class SpanGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val stop = Seq("the", "a", "of", "and", "to")

  /** 50 deterministic tokens with interleaved stopwords (quality-gate
    * viable, span-rich). */
  private def toks(prefix: String): Seq[String] =
    (0 until 50).map(i => if (i % 9 == 0) stop((i / 9) % 5) else s"$prefix$i")

  private def docsDF(rows: Seq[(Long, Seq[String])]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(length(text) AS INT) AS n_chars")
  }

  private def statuses(root: String): Map[Long, String] = {
    val s = spark
    import s.implicits._
    Layout.readStatic(s, root, CurateStream.ManifestEntity).get
      .select("doc_id", "status").as[(Long, String)].collect().toMap
  }

  test("franken-docs trip the span gate; sub-threshold and fresh docs are kept") {
    val a = toks("a"); val b = toks("b"); val f = toks("f")
    val yTail = (0 until 84).map(i =>
      if (i % 9 == 0) stop((i / 9) % 5) else s"y$i")
    val corpus = docsDF(Seq(1L -> a, 2L -> b, 29L -> toks("z")))
    // 100 tokens each, 93 spans:
    //  10: 32 of a + 32 of b + 36 fresh → 50 covered spans (0.54) → span dup
    //  20: 16 of a + 84 fresh          → 9 covered (0.10)        → kept
    //  30: all fresh                                             → kept
    val batch1 = docsDF(Seq(
      10L -> (a.take(32) ++ b.take(32) ++ (0 until 36).map(i =>
        if (i % 9 == 0) stop((i / 9) % 5) else s"x$i")),
      20L -> (a.take(16) ++ yTail),
      30L -> f))
    // batch 2: 40 recomposes runs of BOTH batch-1 keepers (22 of 30's
    // tokens + 22 of 20's — each source too small a fraction for the
    // bands to agree) plus fresh: 30 of 57 spans covered (0.53) —
    // only the fold of kept spans can catch it cross-batch
    val batch2 = docsDF(Seq(
      40L -> (f.take(22) ++ yTail.take(22) ++ (0 until 20).map(i =>
        if (i % 9 == 0) stop((i / 9) % 5) else s"w$i"))))

    val root = graft.Temps.dir("span-gate-root")
    CurateStream.bootstrap(corpus, root, withSpans = true)
    CurateStream.ingestBatch(batch1, root, spanGate = true)
    CurateStream.ingestBatch(batch2, root, spanGate = true)
    val got = statuses(root)
    assert(got(10L) === "dup_span_corpus",
      s"franken-doc must trip the span gate, got ${got(10L)}")
    assert(got(20L) === "kept")
    assert(got(30L) === "kept")
    assert(got(40L) === "dup_span_corpus",
      s"batch-1 keeper's spans must cover the batch-2 recomposition, got ${got(40L)}")

    // replay contract: identical statuses, zero index growth
    val spanCount = Layout.readStatic(spark, root, CurateStream.SpansEntity)
      .get.count()
    val replayed = CurateStream.ingestBatch(batch1, root, spanGate = true)
    import spark.implicits._
    assert(replayed.select("doc_id", "status").as[(Long, String)]
      .collect().toMap === got.view.filterKeys(Set(10L, 20L, 30L)).toMap)
    assert(Layout.readStatic(spark, root, CurateStream.SpansEntity)
      .get.count() === spanCount)
  }

  test("spanGate=false emits no dup_span_corpus and builds no span store") {
    val a = toks("a")
    val corpus = docsDF(Seq(1L -> a, 29L -> toks("z")))
    val batch = docsDF(Seq(
      10L -> (a.take(32) ++ toks("b").take(32) ++ (0 until 36).map(i =>
        if (i % 9 == 0) stop((i / 9) % 5) else s"x$i"))))
    val root = graft.Temps.dir("span-gate-off")
    CurateStream.bootstrap(corpus, root)
    CurateStream.ingestBatch(batch, root)
    assert(statuses(root)(10L) !== "dup_span_corpus")
    assert(Layout.readStatic(spark, root, CurateStream.SpansEntity).isEmpty)
  }
}
