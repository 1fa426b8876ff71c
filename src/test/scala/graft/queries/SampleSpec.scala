package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property pin for [[ShardOps.prefixBudgetSample]] — the selection
  * engine q202 (count quota) and q205 (token budget) both run
  * through: on randomized frames the engine's selected set must equal
  * the NAIVE per-source cumulative window it refuses to run at corpus
  * scale. The generator deliberately covers the engine's edge
  * geometry: colliding h values (tie-break by doc_id), zero-weight
  * rows, single-row sources, and an all-zero-weight source (quota 0,
  * null boundary bucket ⇒ keep-all). */
class SampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def reference(base: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val q = base.groupBy(col("source"))
      .agg(expr("(sum(w) + 3) div 4").as("q"))
    base.withColumn("cum", sum(col("w")).over(Window
        .partitionBy(col("source"))
        .orderBy(col("h").asc, col("doc_id").asc)))
      .join(q, Seq("source"))
      .where(col("cum") <= col("q"))
  }

  test("prefixBudgetSample ≡ per-source cumulative window on random frames") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 8) {
      val n = 40 + rnd.nextInt(160)
      val nSrc = 1 + rnd.nextInt(4)
      // trial 0: unit weights (q202's shape); trial 1: an all-zero
      // source; others: mixed weights incl. zeros. h drawn from a
      // SMALL range on odd trials to force collisions.
      val hRange = if (trial % 2 == 1) 1000L else (1L << 31)
      val rows = (0 until n).map { i =>
        val src = s"src${i % nSrc}"
        val w =
          if (trial == 0) 1L
          else if (trial == 1 && i % nSrc == 0) 0L
          else rnd.nextInt(50).toLong
        (i.toLong, src, math.abs(rnd.nextLong()) % hRange, w)
      } :+ ((n.toLong, "lonely", 7L, 5L)) // single-row source
      val base = rows.toDF("doc_id", "source", "h", "w")
      val got = ShardOps.prefixBudgetSample(base)._1
        .select("doc_id").as[Long].collect().toSet
      val want = reference(base).select("doc_id").as[Long].collect().toSet
      assert(got === want, s"trial $trial: engine vs window diverged")
      assert(got.nonEmpty, s"trial $trial: degenerate empty selection")
    }
  }
}
