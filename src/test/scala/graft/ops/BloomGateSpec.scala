package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.BloomExprs

class BloomGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // corpus keys k0000..k0999; batch = 50 true dups + 950 novel keys
  private def corpus = {
    import spark.implicits._
    (0 until 1000).map(i => f"k$i%04d").toDF("key")
  }
  private def batch = {
    import spark.implicits._
    ((0 until 50).map(i => (i.toLong, f"k$i%04d")) ++
      (0 until 950).map(i => (1000L + i, f"n$i%04d"))).toDF("id", "key")
  }

  test("no false negatives: every true dup is a sketch candidate") {
    val bf = corpus.stat.bloomFilter("key", 1000L, 0.01)
    val missed = batch.where(col("id") < 50)
      .where(!BloomExprs.mightContain(bf)(col("key")))
      .count()
    assert(missed === 0L)
  }

  test("the sketch prunes: candidates ≈ dups + fpp·novel, well under the batch") {
    val bf = corpus.stat.bloomFilter("key", 1000L, 0.01)
    val cand = batch.where(BloomExprs.mightContain(bf)(col("key"))).count()
    assert(cand >= 50L)        // all true dups
    assert(cand <= 50L + 95L)  // ≤ 10× the nominal 1% fp allowance on 950 novel
  }

  test("gate output equals the ungated semi-join across fpp settings") {
    val expected = batch
      .join(corpus.withColumn("is_dup_corpus", lit(true)), Seq("key"), "left")
      .select(col("id"), col("key"),
        coalesce(col("is_dup_corpus"), lit(false)).as("is_dup_corpus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    for (fpp <- Seq(0.5, 0.1, 0.01)) { // even an awful sketch stays exact
      val gated = BloomGate.corpusDupFlag(batch, corpus, "key", 1000L, fpp)
        .select(col("id"), col("key"), col("is_dup_corpus"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
      assert(gated === expected, s"fpp=$fpp")
    }
  }

  test("sketch bits are deterministic for a key set regardless of partitioning") {
    val a = BloomExprs.serialize(corpus.stat.bloomFilter("key", 1000L, 0.01))
    val b = BloomExprs.serialize(
      corpus.repartition(7).stat.bloomFilter("key", 1000L, 0.01))
    assert(java.util.Arrays.equals(a, b))
  }

  test("sharded gate ≡ monolithic gate ≡ ungated semi-join, all shard counts") {
    val expected = batch
      .join(corpus.withColumn("is_dup_corpus", lit(true)), Seq("key"), "left")
      .select(col("id"), col("key"),
        coalesce(col("is_dup_corpus"), lit(false)).as("is_dup_corpus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    for (shards <- Seq(1, 4, 16)) {
      val gated = BloomGate.shardedCorpusDupFlag(batch, corpus, "key",
          shards, 1000L, 0.01)
        .select(col("id"), col("key"), col("is_dup_corpus"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
      assert(gated === expected, s"shards=$shards")
    }
  }

  test("sharded gate routes like the build: no false negatives, real pruning, one image per branch") {
    val sk = BloomGate.buildShards(corpus, "key", 8, 1000L, 0.01)
    assert(sk.length === 8)
    // every true dup is admitted (per-shard filters have no false
    // negatives and routing is deterministic)
    val dups = batch.where(col("id") < 50)
    assert(BloomGate.shardedGate(dups, sk, "key").count() === dups.count())
    // and the novel majority is still pruned (same fpp budget as the
    // monolithic sketch, spread over the shards)
    val cand = BloomGate.shardedGate(batch, sk, "key").count()
    assert(cand >= 50L && cand <= 50L + 95L)
    // shard-locality: every Filter in the gate's plan holds EXACTLY
    // one shard image (the r9 advice — a single all-images expression
    // made each task materialize the whole sketch)
    val perFilter = BloomGate.shardedGate(batch, sk, "key")
      .queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case e: graft.functions.BloomMightContainExpr => e.bfBytes
          }
      }
    assert(perFilter.size === 8)
    assert(perFilter.forall(_.size === 1))
  }

  test("two probes of the same sketch bits compare equal (plan-level CSE)") {
    // r7 advice: an Array[Byte] expression field is reference-equal, so
    // identical probes never canonicalize together and common-
    // subexpression elimination / plan dedup can't fire. SketchBytes
    // restores value semantics: same bits ⇒ equal + semanticEquals.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.{BloomMightContainExpr, CmsEstimateExpr, SketchBytes}
    val key = Literal("k0001")
    val bf1 = SketchBytes(BloomExprs.serialize(
      corpus.stat.bloomFilter("key", 1000L, 0.01)))
    val bf2 = SketchBytes(BloomExprs.serialize(
      corpus.stat.bloomFilter("key", 1000L, 0.01)))
    assert(!(bf1.bytes eq bf2.bytes)) // distinct arrays, equal contents
    val e1 = BloomMightContainExpr(key, bf1)
    val e2 = BloomMightContainExpr(key, bf2)
    assert(e1 === e2)
    assert(e1.hashCode === e2.hashCode)
    assert(e1.semanticEquals(e2))
    val s = spark
    import s.implicits._
    val items = (0L until 100L).toDF("item")
    val item = Literal(5L)
    val c1 = CmsEstimateExpr(item, SketchBytes(graft.functions.CmsExprs.serialize(
      items.stat.countMinSketch("item", 0.01, 0.99, 7))))
    val c2 = CmsEstimateExpr(item, SketchBytes(graft.functions.CmsExprs.serialize(
      items.stat.countMinSketch("item", 0.01, 0.99, 7))))
    assert(c1 === c2)
    assert(c1.semanticEquals(c2))
    // different bits must NOT collide
    val bf3 = SketchBytes(BloomExprs.serialize(
      batch.stat.bloomFilter("key", 1000L, 0.01)))
    assert(e1 !== BloomMightContainExpr(key, bf3))
  }
}
