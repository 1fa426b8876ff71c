package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bucketed tables co-locate joins: both sides bucketed by the join
  * key at the same bucket count → the join plans without any shuffle
  * exchange (the partitioning is reused across stages). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    val loc = graft.Temps.dir("graft-bucketdb")
    s.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$loc'")
    s
  }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dims = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "bucketdb.facts", "k", 8)
    Bucketing.writeBucketed(dims, "bucketdb.dims", "k", 8)

    val joined = Bucketing.readBucketed(spark, "bucketdb.facts")
      .join(Bucketing.readBucketed(spark, "bucketdb.dims").hint("merge"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected no shuffle exchange, got:\n$plan")
    assert(joined.count() === 1000)
  }

  test("groupBy on the bucket key also skips its exchange") {
    val agg = Bucketing.readBucketed(spark, "bucketdb.facts")
      .groupBy(col("k")).agg(sum(col("v")).as("sv"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no shuffle exchange, got:\n$plan")
    assert(agg.count() === 50)
  }

  test("q193's attribution joins against the bucketed projection drop the attribution-side exchanges") {
    // the r11 verdict's last narrative scale claim, now plan-pinned:
    // the overlap-matrix audit joins the corpus-cardinality (doc_id,
    // source) projection twice; against the doc_id-bucketed table the
    // SAME plan (TextOps.sourceOverlapOf — q193's exact shape) loses
    // BOTH attribution-side exchanges, because the scan's bucket
    // partitioning survives the a_id/b_id aliasing. Broadcast is
    // disabled so the test measures the 10^10-doc regime where
    // neither side broadcasts (the r10 finding that removed the
    // hints). AttrBucketBench carries the measured family row.
    import spark.implicits._
    val srcs = (1 to 400).map(i => (i.toLong, s"s${i % 5}"))
      .toDF("doc_id", "source")
    val pairs = (1 to 399).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a_id", "b_id")
    Bucketing.writeBucketed(srcs, "bucketdb.attr_srcs", "doc_id", 8)
    val oldT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldA = try spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
      catch { case _: Exception => null }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
      val plain = graft.queries.TextOps.sourceOverlapOf(pairs, srcs)
      val bucketed = graft.queries.TextOps.sourceOverlapOf(pairs,
        Bucketing.readBucketed(spark, "bucketdb.attr_srcs"))
      assert(exchanges(bucketed) === exchanges(plain) - 2,
        s"plain=${exchanges(plain)} bucketed=${exchanges(bucketed)}:\n" +
          bucketed.queryExecution.executedPlan.toString)
      assert(bucketed.collect().toSet === plain.collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldT)
      if (oldA == null)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      else spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", oldA)
    }
  }

  test("the slot cut stage against the doc_id-bucketed forward projection drops the corpus-side exchange") {
    // SCALE.md's inverted/forward split for the slot face, plan-pinned
    // (r12 verdict #4): the GATHER reads the cell-sorted inverted
    // layout (pushed-In pruning, SlotPolicySpec), while the centroid
    // CUT's candidate-keyed join reads the doc_id-bucketed FORWARD
    // copy — against it the IDENTICAL factored plan
    // (SemanticStream.centroidCutScores, the exact shape the serve
    // path executes) loses the corpus-side shuffle. Broadcast is
    // disabled so the test measures the regime where neither side
    // broadcasts. SlotForwardBench carries the measured family row.
    import spark.implicits._
    val scells = (1 to 400).flatMap(i => Seq(0, 1).map(p =>
        (i.toLong, (i % 16 + p).toLong)))
      .toDF("id", "cell")
    val cand = (0 until 4).flatMap(q => (1 to 200).map(c =>
        (q.toLong, c.toLong)))
      .toDF("q_id", "c_id")
    val qcn = (0 until 4).flatMap(q => (0 until 2).flatMap(qp =>
        (0 until 17).map(cl =>
          (q.toLong, qp, cl.toLong, (q + qp + cl) / 100.0))))
      .toDF("q_id", "qpos", "cell", "qc")
    Bucketing.writeBucketed(scells, "bucketdb.slot_fwd", "id", 8)
    val oldT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldA = try spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
      catch { case _: Exception => null }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
      import graft.streaming.SemanticStream
      val plain = SemanticStream.centroidCutScores(cand,
        scells.select(col("id").as("c_id"), col("cell")), qcn)
      val bucketed = SemanticStream.centroidCutScores(cand,
        Bucketing.readBucketed(spark, "bucketdb.slot_fwd")
          .select(col("id").as("c_id"), col("cell")), qcn)
      assert(exchanges(bucketed) === exchanges(plain) - 1,
        s"plain=${exchanges(plain)} bucketed=${exchanges(bucketed)}:\n" +
          bucketed.queryExecution.executedPlan.toString)
      assert(bucketed.collect().toSet === plain.collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldT)
      if (oldA == null)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      else spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", oldA)
    }
  }

  test("the PRODUCTION slot serve call loses the cut-stage exchange when a fresh forward projection is registered") {
    // r13 verdict #1: the measured-better layout (slot_forward) was
    // bench-only — queryTopKMaxSimSlots always fed centroidCutScores
    // the plain entity. Now the serve path auto-detects the
    // registered ver-fresh bucketed copy: the SERVE call itself (not
    // a re-created stage) plans with one fewer shuffle exchange, and
    // returns identical rows. Broadcast disabled as in the sibling
    // pins.
    import spark.implicits._
    import graft.streaming.SemanticStream
    def corpus = Seq(
        1L -> Seq(1.0, 0.0, 1.0, 0.2), 2L -> Seq(1.0, 0.1, 0.9, 0.0),
        3L -> Seq(0.0, 1.0, 0.0, 0.9), 4L -> Seq(0.1, 1.0, 0.0, 1.0),
        5L -> Seq(0.0, 0.9, 0.1, 1.0), 6L -> Seq(1.0, 0.0, 0.9, 0.1))
      .toDF("vec_id", "embedding")
    def boot(root: String): Unit =
      SemanticStream.bootstrap(corpus, root, k = 2, withSq = true,
        withSlots = true, slotK = 2, slotRounds = 0, slotSlices = 2,
        slotDim = 4)
    val fwdRoot = graft.Temps.dir("bucketing-slot-serve-fwd")
    val plainRoot = graft.Temps.dir("bucketing-slot-serve-plain")
    boot(fwdRoot); boot(plainRoot)
    SemanticStream.writeSlotForward(spark, fwdRoot, "bucketdb.serve_fwd", 4)
    val queries = Seq(500L -> Seq(0.0, 1.0, 0.0, 1.0))
      .toDF("vec_id", "embedding")
    // the serve pipeline materializes stage 1 eagerly (maxSimRerank
    // checkpoints its candidate frame), so the returned frame's plan
    // covers only the rerank — the cut join's exchange lives in an
    // INTERNAL action. A QueryExecutionListener sums exchanges over
    // every action the serve call runs, end to end: the armed call
    // must execute exactly one fewer.
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    val oldT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldA = try spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
      catch { case _: Exception => null }
    spark.listenerManager.register(listener)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      def count(ps: Seq[String]): Int =
        ps.map("Exchange hashpartitioning".r.findAllIn(_).size).sum
      // the listener bus is async: poll until the captured set stops
      // growing before reading it
      def settled(): Seq[String] = {
        var last = -1
        var cur = plans.synchronized(plans.size)
        while (cur != last) {
          last = cur; Thread.sleep(250)
          cur = plans.synchronized(plans.size)
        }
        plans.synchronized(plans.toSeq)
      }
      def serve(root: String): (Set[(Long, Int, Long, Double)], Int) = {
        plans.synchronized { plans.clear() }
        val df = SemanticStream.queryTopKMaxSimSlots(
          queries, root, topK = 3, prefilterC = 16, slotNProbe = 1, cutC = 2)
        val rows = df.select("q_id", "rn", "c_id", "maxsim").collect()
          .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
          .toSet
        (rows, count(settled()))
      }
      val (plainRows, plainEx) = serve(plainRoot)
      val (armedRows, armedEx) = serve(fwdRoot)
      assert(plainRows.nonEmpty && armedRows === plainRows)
      // measured at the pin's fixture: plain 40, armed 38 — the cut
      // join's corpus-side exchange goes, plus a downstream exchange
      // the bucketed output partitioning lets AQE elide. Pin the
      // direction strictly (the factored-stage test above pins the
      // exact -1 on the isolated cut plan).
      assert(armedEx < plainEx, s"plain=$plainEx armed=$armedEx")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldT)
      if (oldA == null)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      else spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", oldA)
    }
  }

  test("bucketed write round-trips data exactly") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"x$i")).toDF("k", "s")
    Bucketing.writeBucketed(df, "bucketdb.rt", "k", 4, SaveMode.Overwrite)
    val back = Bucketing.readBucketed(spark, "bucketdb.rt")
    assert(back.count() === 100)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
