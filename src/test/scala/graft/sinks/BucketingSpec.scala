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

  test("bucketed write round-trips data exactly") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"x$i")).toDF("k", "s")
    Bucketing.writeBucketed(df, "bucketdb.rt", "k", 4, SaveMode.Overwrite)
    val back = Bucketing.readBucketed(spark, "bucketdb.rt")
    assert(back.count() === 100)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
