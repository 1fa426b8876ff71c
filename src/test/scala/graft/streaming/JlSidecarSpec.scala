package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sinks.Layout

/** The JL maintained-sidecar contract ([[SemanticStream]] withJl):
  *
  *  1. exactness at covering prefilter — [[SemanticStream.queryTopKJl]]
  *     with a prefilter wide enough to pass every probed candidate is
  *     bit-identical to the exact [[SemanticStream.queryTopK]] (the
  *     projection is then a pure plan detour: the re-rank sees the
  *     same candidate set);
  *  2. fold discipline — only KEPT ingest vectors land projected rows,
  *     and the sidecar's id set tracks the inverted file's;
  *  3. the rotation crash window — [[SemanticStream.rotateJlFamily]]
  *     lands meta first, rows second; a kill between the swaps leaves
  *     a detectable family-tag mismatch that the next serve ROLLS
  *     FORWARD, answering identically to a rotation that never
  *     crashed.
  */
class JlSidecarSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def vec(parts: (Int, Double)*): Seq[Double] = {
    val a = Array.fill(8)(0.0)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // near-orthogonal one-hot clusters: cross-cluster cosines stay well
  // under the 0.3 dup threshold, so keep/drop decisions are pinned
  private def corpus = df(Seq(
    1L -> vec(0 -> 1.0), 2L -> vec(0 -> 1.0, 4 -> 0.2),
    3L -> vec(1 -> 1.0), 4L -> vec(1 -> 1.0, 5 -> 0.2),
    5L -> vec(2 -> 1.0), 6L -> vec(2 -> 1.0, 6 -> 0.2),
    7L -> vec(3 -> 1.0), 8L -> vec(3 -> 1.0, 7 -> 0.2)))
  private def batch = df(Seq(
    100L -> vec(1 -> 1.0),              // exact twin of corpus 3 → dup
    101L -> vec(4 -> 0.3, 5 -> 1.0)))   // fresh direction → kept
  private def queries = df(Seq(
    300L -> vec(0 -> 0.9, 1 -> 0.3),
    301L -> vec(2 -> 0.8, 3 -> 0.4),
    302L -> vec(5 -> 1.0, 1 -> 0.2),
    303L -> vec(6 -> 0.6, 7 -> 0.8)))

  private def served(df0: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
    df0.select("q_id", "rn", "c_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("covering prefilter: JL-served top-k equals the exact serve") {
    val root = graft.Temps.dir("jl-covering")
    SemanticStream.bootstrap(corpus, root, withJl = true, jlDOut = 4)
    SemanticStream.ingestVectors(batch, root).unpersist()
    val exact = served(SemanticStream.queryTopK(queries, root, topK = 3))
    val jl = served(SemanticStream.queryTopKJl(queries, root, topK = 3,
      prefilterC = 1000))
    assert(jl === exact)
  }

  test("only kept vectors fold projected rows; sidecar ids track the inverted file") {
    val root = graft.Temps.dir("jl-fold")
    SemanticStream.bootstrap(corpus, root, withJl = true, jlDOut = 4)
    SemanticStream.ingestVectors(batch, root).unpersist()
    val cellIds = Layout.readStatic(spark, root, SemanticStream.CellsEntity)
      .get.select("id").collect().map(_.getLong(0)).toSet
    val pvIds = Layout.readStatic(spark, root, SemanticStream.JlVecsEntity)
      .get.select("id").collect().map(_.getLong(0)).toSet
    assert(pvIds === cellIds)
    assert(pvIds.contains(101L) && !pvIds.contains(100L))
    // projected width is the stored family's dOut
    val w = Layout.readStatic(spark, root, SemanticStream.JlVecsEntity)
      .get.select(size(col("pv"))).distinct().collect().map(_.getInt(0)).toSet
    assert(w === Set(4))
  }

  test("torn rotation: meta landed, rows not — next serve rolls forward, answers unchanged") {
    val crashRoot = graft.Temps.dir("jl-rotate-crash")
    val cleanRoot = graft.Temps.dir("jl-rotate-clean")
    for (root <- Seq(crashRoot, cleanRoot)) {
      SemanticStream.bootstrap(corpus, root, withJl = true, jlDOut = 4)
      SemanticStream.ingestVectors(batch, root).unpersist()
    }
    // clean rotation to a wider family
    SemanticStream.rotateJlFamily(spark, cleanRoot, dOut = 6, seed = 7L)
    // crashed rotation: kill right after the meta swap
    final class Boom extends RuntimeException("kill")
    intercept[Boom] {
      SemanticStream.rotateJlFamily(spark, crashRoot, dOut = 6, seed = 7L,
        afterMetaSwap = () => throw new Boom)
    }
    // the torn store is detectable: rows still carry the old family tag
    val metaVer = SemanticStream.readJlMeta(spark, crashRoot).get._3
    val rowVers = Layout.readStatic(spark, crashRoot,
        SemanticStream.JlVecsEntity)
      .get.select("ver").distinct().collect().map(_.getString(0)).toSet
    assert(rowVers !== Set(metaVer))
    // serving repairs it and answers exactly like the clean root
    val got = served(SemanticStream.queryTopKJl(queries, crashRoot,
      topK = 3, prefilterC = 3))
    val want = served(SemanticStream.queryTopKJl(queries, cleanRoot,
      topK = 3, prefilterC = 3))
    assert(got === want)
    val healedVers = Layout.readStatic(spark, crashRoot,
        SemanticStream.JlVecsEntity)
      .get.select("ver").distinct().collect().map(_.getString(0)).toSet
    assert(healedVers === Set(metaVer))
    // and the healed rows are the wider family's
    val w = Layout.readStatic(spark, crashRoot, SemanticStream.JlVecsEntity)
      .get.select(size(col("pv"))).distinct().collect().map(_.getInt(0)).toSet
    assert(w === Set(6))
  }
}
