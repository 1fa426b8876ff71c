package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark
import Sessionize.Ev

/** Watermarked event-time processing driven through REAL streaming
  * queries (MemoryStream source, memory sink, multiple micro-batches
  * with an advancing watermark). */
class StatefulSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(min: Int) = new java.sql.Timestamp(3600_000L + min * 60_000L)

  test("flatMapGroupsWithState sessions close via event-time timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val source = MemoryStream[Ev]
    val sessions = Sessionize.sessions(
      source.toDS().withWatermark("ts", "0 seconds"), gapMs = 10 * 60_000L)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 has events at t+0 and t+5min (one open session)
      source.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0) // still open
      // batch 2: an event far in the future advances the watermark past
      // t+15min → user 1's session times out and is emitted
      source.addData(Ev(2L, ts(120), 9.0))
      q.processAllAvailable()
      source.addData(Ev(2L, ts(121), 1.0)) // one more batch to fire timeouts
      q.processAllAvailable()
      val out = spark.table("sessions_out").as[Sessionize.Session].collect()
        .filter(_.user_id == 1L)
      assert(out.length === 1)
      assert(out.head.n_events === 2)
      assert(out.head.sum_value === 3.0)
      assert(out.head.start_us === ts(0).getTime * 1000L)
      assert(out.head.end_us === ts(5).getTime * 1000L)
    } finally q.stop()
  }

  test("watermarked sliding-window aggregation emits finalized windows only") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val source = MemoryStream[Ev]
    val agg = source.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("start"), col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory")
      .queryName("win_out").outputMode(OutputMode.Append()).start()
    try {
      source.addData(Ev(1L, ts(1), 1.0), Ev(1L, ts(6), 2.0))
      q.processAllAvailable()
      source.addData(Ev(1L, ts(60), 0.0)) // watermark → t+55min, finalizes early windows
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(unix_micros(col("start")).as("s"), col("n"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // event at t+1 ∈ windows [t-5,t+5) and [t,t+10); event at t+6 ∈ [t,t+10) and [t+5,t+15)
      val t0 = 3600_000_000L // t in epoch micros
      assert(rows.contains((t0 - 300_000_000L, 1L, 1.0)))
      assert(rows.contains((t0, 2L, 3.0)))
      assert(rows.contains((t0 + 300_000_000L, 1L, 2.0)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replays, bounds state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val source = MemoryStream[Ev]
    val deduped = source.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "ts")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode(OutputMode.Append()).start()
    try {
      source.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(0), 1.0)) // in-batch dup
      q.processAllAvailable()
      source.addData(Ev(1L, ts(0), 1.0)) // cross-batch replay, inside watermark
      source.addData(Ev(2L, ts(1), 5.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").as[Ev].collect()
      assert(rows.count(_.user_id == 1L) === 1) // replays dropped
      assert(rows.count(_.user_id == 2L) === 1)
    } finally q.stop()
  }
}
