package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** The reference's streaming semantics (SURVEY.md §2.10) as driver-
  * verifiable batch queries. The live pipeline itself lives in
  * [[graft.streaming.Incremental]] (exercised by IncrementalSpec with a
  * real Structured Streaming query); here we verify the two semantic
  * pillars against the DuckDB oracle:
  *
  *  - q50: delete-then-reinsert per block == recompute-partition-and-union
  *    equals a full recompute (idempotency of K5 / partition overwrite);
  *  - q51: event-time sliding windows (the watermark+window shape Spark
  *    adds over the reference).
  */
object StreamOps {

  def defs: Map[String, Q] = Map(
    // §2.10 K5: recompute last-day partition + untouched history, then
    // merge — must equal the straight per-hour aggregate (the oracle).
    "q50_incremental" -> Q(
      (s, d) => {
        val ev = events(s, d).select(
          date_trunc("hour", col("ts").cast("timestamp")).as("hour"),
          col("value").cast("decimal(18,2)").as("v"))
        // "live" partition boundary: the latest day (A14-style max scan —
        // a scalar, collected like the reference's max-indexed-block)
        val maxDay = ev.agg(max(to_date(col("hour")))).head().getDate(0)
        val history = ev.where(to_date(col("hour")) < lit(maxDay))
          .groupBy(col("hour"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        val replayed = ev.where(to_date(col("hour")) === lit(maxDay))
          .groupBy(col("hour"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        history.unionByName(replayed)
          .groupBy(col("hour")).agg(sum(col("n")).as("n_events"),
            sum(col("sv")).cast("double").as("sum_value"))
          .select(unix_micros(col("hour")).as("hour_us"),
            col("n_events"), col("sum_value"))
      },
      Some("""SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1""".stripMargin),
      "idempotent partition recompute == full recompute: SURVEY §2.10/K5"),

    // event-time sliding window agg (2h window, 1h slide)
    "q51_sliding_window" -> Q(
      (s, d) => events(s, d)
        .select(col("ts").cast("timestamp").as("ts"),
          col("value").cast("decimal(18,2)").as("v"))
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("v")).cast("double").as("sum_value"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("n_events"), col("sum_value")),
      Some("""WITH w AS (
             |  SELECT epoch_us(date_trunc('hour', ts)) - off * 3600000000 AS win_start_us,
             |         value
             |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off))
             |SELECT win_start_us, count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM w GROUP BY 1""".stripMargin),
      "event-time sliding windows: SURVEY §2.10 (Spark-side upgrade)"),

    // as-of join: each event picks up the customer's latest order at or
    // before the event time (single-shuffle union+window formulation;
    // oracle = DuckDB's native ASOF JOIN). Right side pre-deduped at
    // (custkey, orderdate) by max orderkey so the tie-break is
    // deterministic on both engines.
    "q52_asof_join" -> Q(
      (s, d) => {
        val ev = events(s, d).select(
          col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
        val ord = orders(s, d)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_key"),
            max(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("o_price"))
        graft.ops.AsOf.asofJoin(
          ev, "user_id", "ts",
          ord, "o_custkey", "o_orderdate", Seq("o_key", "o_price"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            col("asof_o_key"), col("asof_o_price"))
      },
      Some("""WITH r AS (
             |  SELECT o_custkey AS k, o_orderdate AS rt,
             |         max(o_orderkey) AS o_key,
             |         CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS o_price
             |  FROM orders GROUP BY 1, 2)
             |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |       r.o_key AS asof_o_key, r.o_price AS asof_o_price
             |FROM events ASOF LEFT JOIN r
             |  ON events.user_id = r.k AND events.ts >= r.rt""".stripMargin),
      "as-of join (latest right row per left timestamp), one shuffle"),

    // banded range join: attribution windows — every event landing
    // within 1 hour after a purchase by the same user. Inequality-only
    // joins nested-loop in Spark; the banding turns point-in-interval
    // into an equi-join on (key, hour-bucket) with bounded interval
    // fan-out. Oracle = DuckDB's native inequality join.
    "q53_range_join" -> Q(
      (s, d) => {
        val ev = events(s, d).select(
          col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
        val anchors = events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id").as("a_user"),
            col("ts").cast("timestamp").as("ws"), col("event_id"))
          .groupBy(col("a_user"), col("ws"))
          .agg(max(col("event_id")).as("anchor_id"))
          .withColumn("we", col("ws") + expr("INTERVAL 1 HOUR"))
        graft.ops.RangeJoin.bandedRangeJoin(
          ev, "user_id", "ts",
          anchors, "a_user", "ws", "we",
          Seq("anchor_id"), bucketUs = 3600L * 1000000L)
          .where(col("event_id") =!= col("anchor_id"))
          .select(col("event_id"), col("user_id"), col("anchor_id"))
      },
      Some("""WITH r AS (
             |  SELECT user_id AS k, ts AS ws, ts + INTERVAL 1 HOUR AS we,
             |         max(event_id) AS anchor_id
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3)
             |SELECT e.event_id, e.user_id, r.anchor_id
             |FROM events e JOIN r
             |  ON e.user_id = r.k AND e.ts >= r.ws AND e.ts < r.we
             |     AND e.event_id <> r.anchor_id""".stripMargin),
      "banded range join (point-in-interval as bucketed equi-join)"),

    // §2.10 END-TO-END under the oracle gate: a REAL Structured
    // Streaming query (AvailableNow trigger → foreachBatch → per-block
    // partition replacement) ingests events as block-keyed rows, then a
    // replay batch reprocesses one block (the delete-then-reinsert
    // idempotency contract). The read-back aggregate must equal a
    // plain one-shot aggregate — replay changed nothing.
    "q66_stream_e2e" -> Q(
      (s, d) => {
        // memoized per dataset dir: re-invocations reuse the same
        // raw/out/checkpoint trees (reprocessing is idempotent — the
        // sink replaces block partitions), and the shutdown hook
        // removes the whole root at JVM exit
        val rawDir = graft.Temps.dirFor(s"stream-raw-$d")
        val outRoot = graft.Temps.dirFor(s"stream-out-$d")
        val ckpt = graft.Temps.dirFor(s"stream-ckpt-$d")
        val raw = events(s, d).select(
          expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("block_number"),
          col("event_id"),
          col("value").cast("decimal(18,2)").as("v"))
        // the raw input is a pure function of the dataset dir: if the
        // memoized dir is already populated, rewriting it would only
        // mint new part-file names and force the checkpointed stream to
        // reprocess identical data — skip instead (incremental
        // semantics: unchanged input, no reprocessing)
        val rawReady = Option(new java.io.File(rawDir).list())
          .exists(_.exists(_.startsWith("part-")))
        if (!rawReady) raw.write.mode("overwrite").parquet(rawDir)
        val derive = Map("ev" -> identity[org.apache.spark.sql.DataFrame] _)
        val q = graft.streaming.Incremental.run(
          s.readStream.schema(raw.schema).parquet(rawDir), outRoot, ckpt, derive)
        q.awaitTermination()
        // replay one block: must replace, not duplicate
        val someBlock = raw.agg(min(col("block_number"))).head.getLong(0)
        graft.streaming.Incremental.backfill(
          raw.where(col("block_number") === someBlock), outRoot, derive)
        s.read.parquet(s"$outRoot/dynamic/ev")
          .groupBy(col("block_number"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("v")).cast("double").as("sum_value"))
      },
      Some("""SELECT epoch_us(ts) // 3600000000 AS block_number,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1""".stripMargin),
      "real Structured Streaming E2E + idempotent block replay (§2.10)"))
}
