package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for the retrieval compositions (the oracles are the
  * value gate; these pin the PROPERTIES): RRF fuses only docs that
  * appear on a leg, the lexical self-match anchors rank 1, and the
  * unigram-LM decile flag cuts exactly the bottom tenth. */
class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("rrf fusion: fused docs come from the legs, self-doc tops the lexical leg") {
    val s = spark
    import s.implicits._
    val rows = Registry.all("q162_rrf_fusion").fn(spark, sfDir)
      .select("q_id", "rn", "doc_id", "rrf", "lex_rn", "dense_rn")
      .as[(Long, Int, Long, Double, Int, Int)].collect()
    assert(rows.length === 25) // 5 queries × top-5
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq === (1 to 5), s"q=$q ranks")
    }
    rows.foreach { case (q, _, doc, rrf, lexRn, denseRn) =>
      // on ≥1 leg, and the rrf is exactly the sum of its leg terms
      assert(lexRn > 0 || denseRn > 0, s"q=$q doc=$doc off both legs")
      val expect = (if (lexRn > 0) 1.0 / (60 + lexRn) else 0.0) +
        (if (denseRn > 0) 1.0 / (60 + denseRn) else 0.0)
      assert(math.abs(rrf - expect) < 1e-6, s"q=$q doc=$doc")
    }
    // (no self-doc pin: BM25's length normalization legitimately lets
    // a longer superset doc outscore the query's own source, and the
    // dense leg excludes self-matches by construction)
    // a doc on both legs always outranks a doc on neither leg's top —
    // minimal dual-leg rrf (1/65+1/65) beats maximal single-leg (1/61)
    rows.groupBy(_._1).foreach { case (q, g) =>
      val dual = g.filter(r => r._5 > 0 && r._6 > 0).map(_._2)
      val single = g.filter(r => r._5 == 0 || r._6 == 0).map(_._2)
      if (dual.nonEmpty && single.nonEmpty)
        assert(dual.max < single.min, s"q=$q dual-leg doc ranked below single-leg")
    }
  }

  test("unigram-lm: the flag cuts exactly the bottom mean_p decile") {
    val s = spark
    import s.implicits._
    val rows = Registry.all("q164_unigram_lm").fn(spark, sfDir)
      .select("doc_id", "mean_p", "flagged")
      .as[(Long, Double, Boolean)].collect()
    assert(rows.length === 500)
    val (fl, ok) = rows.partition(_._3)
    assert(fl.length === 50)
    // decile cut: every flagged doc scores ≤ every unflagged doc
    assert(fl.map(_._2).max <= ok.map(_._2).min + 1e-12)
  }
}
