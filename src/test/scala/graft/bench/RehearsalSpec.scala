package graft.bench

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The rehearsal harnesses' batch generators are measurement fixtures —
  * if their invariants drift (id collisions across batches, the
  * verbatim fraction vanishing, canary twins not pairing), the
  * measured laws silently measure something else. Pin them on a
  * hand-built corpus. */
class RehearsalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("CurateRehearsal batches: disjoint ids, verbatim fifth, kept-viable text") {
    val s = spark
    import s.implicits._
    val base = (0 until 40).map { i =>
      (i.toLong, s"the quick doc $i of and to " + (0 until 50).map(j => s"w$i-$j").mkString(" "),
        "en", "src")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val batches = 4
    val all = (0 until batches).map(CurateRehearsal.batchOf(base, _, batches))
    val ids = all.map(_.select("doc_id").as[Long].collect().toSet)
    assert(ids.map(_.size).sum === 40, "every base doc lands in exactly one batch")
    assert(ids.reduce(_ intersect _).isEmpty && ids.flatten.toSet.size === 40,
      "re-ids are globally unique across batches")
    assert(ids.flatten.forall(_ >= 10000000L), "re-id range disjoint from base ids")
    val b0 = all.head.localCheckpoint()
    val verbatim = b0.join(base.select(col("text")), Seq("text"), "left_semi").count()
    // re-id is 10^7 + base_id·1000 + b, so base_id ≡ doc_id div 1000 (mod 5)
    assert(verbatim === b0.where(floor(col("doc_id") / 1000) % 5 === 0).count()
      && verbatim > 0,
      "exactly the every-5th base slice keeps its text verbatim")
    // mutated docs keep their stopwords — the kept-viability fix: a
    // 0-stopword doc dies at the low_quality gate and the index growth
    // law goes unmeasured
    val mut = b0.join(base.select(col("text")), Seq("text"), "left_anti")
      .select(col("text")).as[String].head()
    assert(mut.split(" ").count(Set("the", "a", "of", "and", "to")) > 0)
    // deterministic: same (batch, base) → bit-identical frame
    assert(CurateRehearsal.batchOf(base, 0, batches).collect().toSeq ===
      b0.collect().toSeq)
  }

  test("SemanticRehearsal batches: canary pairing, unit drift schedule") {
    val s = spark
    import s.implicits._
    val base = (0 until 24).map(i =>
      (i.toLong, (0 until 8).map(j => math.sin(i * 8 + j + 1)).toSeq)).toDF("vec_id", "embedding")
    val batches = 4
    val b1 = SemanticRehearsal.batchOf(base, 1, batches).localCheckpoint()
    val ids = b1.select("vec_id").as[Long].collect().sorted
    assert(ids.length === 12, "6 originals + 6 twins")
    assert(ids.grouped(2).forall { case Array(o, t) => t === o + 1 },
      "every original is immediately followed by its canary twin id")
    // α schedule: ramps to 1 by mid-stream, then settles
    assert(SemanticRehearsal.alphaOf(0, 24) === 0.0)
    assert(SemanticRehearsal.alphaOf(12, 24) === 1.0)
    assert(SemanticRehearsal.alphaOf(23, 24) === 1.0)
    // twin stays a genuine near-dup of its partner: cos well over the
    // 0.3 dup threshold but under byte-identity
    val vecs = b1.select("vec_id", "embedding").as[(Long, Seq[Double])]
      .collect().toMap
    val cosines = ids.grouped(2).map { case Array(o, t) =>
      val (a, b) = (vecs(o), vecs(t))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }.toSeq
    assert(cosines.forall(c => c > 0.5 && c < 0.999), s"canary cosines: $cosines")
  }
}
