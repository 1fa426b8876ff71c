package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The containment detector's reason to exist (q170): a SHORT doc
  * embedded verbatim in a much longer one has near-zero Jaccard (the
  * union is the long doc) but containment ≈ 1 on the short side. The
  * driver corpus has no such asymmetric pairs, so this constructs one
  * and drives the REGISTERED query over it (written as a documents
  * table in a scratch dir — the same read path as the oracle gate). */
class ContainmentSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("an embedded excerpt is contained but Jaccard-blind") {
    val s = spark
    import s.implicits._
    val words = (0 until 400).map(i => s"w$i")
    val long = words.mkString(" ")                       // 400 tokens
    val excerpt = words.slice(100, 140).mkString(" ")    // 40 of them, verbatim
    val other = (0 until 60).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, long, "en", "src1"),
      (2L, excerpt, "en", "src1"),
      (3L, other, "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = graft.Temps.dir("containment-docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.all("q170_containment").fn(spark, dir)
      .select("a_id", "b_id", "cont_a", "cont_b", "contained", "jaccard_blind")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5)))
    // exactly the (long, excerpt) pair survives the candidate join
    assert(rows.length === 1)
    val (aId, bId, contA, contB, contained, blind) = rows.head
    assert((aId, bId) === (1L, 2L))
    // every shingle of the excerpt is in the long doc: containment on
    // the short side is exactly 1; on the long side it's tiny
    assert(contB === 1.0)
    assert(contA < 0.15)
    assert(contained)
    // and symmetric Jaccard ≈ inter/union < 0.5 — the pair a Jaccard
    // threshold would never kill, which is the operator's whole point
    assert(blind)
  }
}
