package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Path-activation proof for q143's drop provenance: the synthetic
  * corpus never exercises the exact-dup or in-batch-near-dup branches
  * at oracle scale (measured: sf0.01's batch hits 5 of the 8
  * statuses), so this spec drives a hand-built corpus through ALL
  * EIGHT — each branch of the status CASE is pinned by at least one
  * doc, and the precedence order is pinned by docs eligible for more
  * than one status (doc 0 is both an exact corpus dup and a bench
  * member: the exact stage must claim it first). */
class CurateIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 50-token quality text: 45 unique `w{k}_i` tokens + 5 stopwords
    * (ratio 0.1 ≥ 0.03, n_toks ≥ 40 — passes the quality gate). The
    * stopwords are INTERLEAVED, never adjacent: they are the only
    * tokens shared across docs, so no 4-token shingle is shared and
    * quality docs don't cross-contaminate via the bench set. */
  private def qtext(k: Int): String = {
    val stop = Seq("the", "a", "of", "and", "to")
    (0 until 45).flatMap(i =>
      if (i % 9 == 0) Seq(stop(i / 9), s"w${k}_$i") else Seq(s"w${k}_$i"))
      .mkString(" ")
  }

  test("all eight provenance statuses fire, with the pinned precedence") {
    val s = spark
    import s.implicits._
    val t1 = qtext(1); val t2 = qtext(2)
    val t3 = qtext(3); val t4 = qtext(4)
    val t6 = qtext(6)
    // batch = doc_id % 5 = 0; corpus = the rest; bench = doc_id % 29 = 0
    val rows = Seq(
      // batch 0 ≡ corpus 1 byte-for-byte → dup_exact_corpus — and 0 is
      // ALSO a bench member (0 % 29 = 0): exact-stage precedence wins
      0L -> t1, 1L -> t1,
      // batch 5 ≡ batch 10: keep-best (same length → lower id) keeps 5,
      // 10 → dup_exact_batch; 5 runs the rest of the chain → kept
      5L -> t2, 10L -> t2,
      // batch 15 vs corpus 2: one appended token — 47 of 48 shingles
      // shared, the 4-hash MinHash bands collide → dup_near_corpus
      15L -> t3, 2L -> (t3 + " tail3"),
      // batch 20 vs batch 25: same construction in-batch — the pair
      // scores ≥ 0.5 and the LARGER id drops → 25 dup_near_batch
      20L -> t4, 25L -> (t4 + " tail4"),
      // batch 30 embeds one 4-token shingle of bench doc 29 (29 % 29 =
      // 0) inside otherwise-unique quality text → contaminated (the 4
      // shared tokens of ~50 are far below the near-dup threshold)
      29L -> t6, 30L -> (qtext(7) + " w6_0 w6_1 w6_2 w6_3"),
      // batch 35: three tokens → low_quality (no shingles, no sig —
      // the doc must still flow through to the per-row gate)
      35L -> "just three tokens",
      // batch 40: unique quality text → kept
      40L -> qtext(8),
      // batch 145 (145 = 5·29): survives every dedup stage, then
      // routes to the eval suite → bench_member
      145L -> qtext(9))
    val docs = rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(length(text) AS INT) AS n_chars")
    val got = TextOps.curateIncremental(docs)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    val want = Map(
      0L -> "dup_exact_corpus", 5L -> "kept", 10L -> "dup_exact_batch",
      15L -> "dup_near_corpus", 20L -> "kept", 25L -> "dup_near_batch",
      30L -> "contaminated", 35L -> "low_quality", 40L -> "kept",
      145L -> "bench_member")
    assert(got === want)
    // every status value the query can emit appeared (kept included)
    assert(got.values.toSet.size === 8)
  }
}
