package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.SimSearch

/** The filtered-search face (q188 / [[SemanticStream.sqCandidates]]'s
  * `allowed` parameter): predicate containment, exactness at covering
  * knobs, and the budget argument for filtering BEFORE the prefilter
  * window rather than post-filtering an unfiltered top-k. */
class FilteredAnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb =
    graft.queries.Tables.embeddings(spark, sfDir).localCheckpoint()

  private lazy val root: String = {
    val r = graft.Temps.dir("filtered-ann-spec")
    SemanticStream.bootstrap(emb, root = r, withSq = true)
    r
  }

  private lazy val allowed =
    emb.where(col("label") === 3).select(col("vec_id").as("id"))
      .localCheckpoint()

  private lazy val queries =
    emb.where(pmod(col("vec_id"), lit(29)) === 0).localCheckpoint()

  test("every filtered hit satisfies the predicate") {
    val served = SemanticStream.queryTopKSq(queries, root, topK = 5,
      prefilterC = SemanticStream.ServePolicy.PrefilterC,
      nProbe = SemanticStream.ServePolicy.NProbe,
      allowed = Some(allowed))
    val outside = served.join(allowed.withColumnRenamed("id", "c_id"),
      Seq("c_id"), "left_anti").count()
    assert(outside === 0L, s"$outside served hits violate the predicate")
    assert(served.count() > 0L)
  }

  test("at covering knobs the filtered serve equals the brute filtered gold") {
    // probe every cell and give the prefilter the whole eligible set:
    // the served result must then be EXACTLY the filtered full scan
    val nAllowed = allowed.count().toInt
    val served = SemanticStream.queryTopKSq(queries, root, topK = 3,
        prefilterC = nAllowed, nProbe = SimSearch.IvfK,
        allowed = Some(allowed))
      .select("q_id", "c_id", "rn")
    val corpus = emb.join(allowed.withColumnRenamed("id", "vec_id"),
      Seq("vec_id"), "left_semi")
    val gold = SimSearch.bruteForceTopK(queries, corpus, "vec_id",
        "embedding", k = 3)
      .select("q_id", "c_id", "rn")
    assert(served.exceptAll(gold).count() === 0L &&
      gold.exceptAll(served).count() === 0L,
      "covering-knob filtered serve diverged from the filtered full scan")
  }

  test("pre-filtering preserves the candidate budget; post-filtering starves it") {
    val c = 16 // a tight budget makes the starvation visible
    val pre = SemanticStream.queryTopKSq(queries, root, topK = 5,
      prefilterC = c, nProbe = SemanticStream.ServePolicy.NProbe,
      allowed = Some(allowed))
    // post-filter shape: unfiltered serve, then drop ineligible hits
    val post = SemanticStream.queryTopKSq(queries, root, topK = 5,
        prefilterC = c, nProbe = SemanticStream.ServePolicy.NProbe)
      .join(allowed.withColumnRenamed("id", "c_id"), Seq("c_id"), "left_semi")
    val (nPre, nPost) = (pre.count(), post.count())
    assert(nPre > nPost,
      s"expected the pre-filter budget to out-fill post-filtering " +
        s"($nPre vs $nPost) — at ~10% selectivity a $c-candidate " +
        "post-filter keeps ~1-2 eligible rows per query")
  }
}
