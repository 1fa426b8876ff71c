package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Cross-validation of the engine's custom MinHash banding against
  * MLlib's MinHashLSH (SURVEY §7.4 names the MLlib operator as the
  * built-in scale path; the custom native-expression pipeline exists
  * because its signatures are reproducible in the DuckDB oracle).
  * Both must agree with EXACT Jaccard on which pairs are near-dups. */
class MLlibLshSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("MLlib MinHashLSH approxSimilarityJoin finds the exact near-dup pairs") {
    import spark.implicits._
    val vocab = 64
    // three docs: 0 and 1 share most tokens, 2 is disjoint
    val docs = Seq(
      (0L, (0 until 20).toArray),
      (1L, (2 until 22).toArray),
      (2L, (40 until 60).toArray))
    val df = docs.map { case (id, toks) =>
      (id, Vectors.sparse(vocab, toks.map(t => (t, 1.0))))
    }.toDF("id", "features")
    val lsh = new MinHashLSH().setNumHashTables(8).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(df)
    val pairs = model.approxSimilarityJoin(df, df, 0.5, "dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"), col("dist"))
      .where(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact Jaccard: |0∩1| = 18, |0∪1| = 22 → 0.818 sim → dist 0.182 < 0.5
    assert(pairs === Set((0L, 1L)))
  }

  test("custom banding agrees with exact Jaccard on the same corpus") {
    import spark.implicits._
    // token arrays (≥4 tokens so 4-shingles exist); a/b near-identical
    val t0 = (0 until 24).map(i => s"w$i")
    val docs = Seq(
      (0L, t0),
      (1L, t0.updated(23, "zz")), // one token differs → shingle sets overlap heavily
      (2L, (0 until 24).map(i => s"x$i")))
    val df = docs.toDF("doc_id", "T")
    val sig = df.withColumn("sig", graft.functions.EvmExprs.minHashSig(col("T")))
      .select(col("doc_id") +: (0 until 4).map(j =>
        element_at(col("sig"), j + 1).as(s"h$j")): _*)
    val bands = sig.select(col("doc_id"), lit(0).as("band"), col("h0").as("x"), col("h1").as("y"))
      .unionByName(sig.select(col("doc_id"), lit(1).as("band"), col("h2").as("x"), col("h3").as("y")))
    val cand = bands.toDF("a", "band", "x", "y")
      .join(bands.toDF("b", "band", "x", "y"), Seq("band", "x", "y"))
      .where(col("a") < col("b")).select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical first-23-token shingles dominate: (0,1) must be a candidate,
    // the disjoint doc 2 must pair with nobody
    assert(cand.contains((0L, 1L)))
    assert(!cand.exists(p => p._1 == 2L || p._2 == 2L))
  }
}
