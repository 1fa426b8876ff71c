package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** The lifetimes analysis (SURVEY.md §2.5 A10-A13, §2.4 J5/J6, §2.6 W1/W4)
  * restated over the `events` stream table: user_id plays the contract
  * address, 'signup' plays deployment, 'error' plays destruction.
  * Timestamps are compared as epoch MICROseconds (exact integers) so the
  * DuckDB oracle matches bit-for-bit.
  */
object EventOps {

  /** Epoch microseconds of a (possibly NTZ) timestamp under the UTC
    * session timezone — integer-exact on both engines (F9). */
  private def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  def defs: Map[String, Q] = Map(
    // J5 + A13 + F9: per-contract lifetime span
    "q08_lifetimes" -> Q(
      (s, d) => events(s, d).groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        min(epochUs(col("ts"))).as("first_us"),
        max(epochUs(col("ts"))).as("last_us"),
        (max(epochUs(col("ts"))) - min(epochUs(col("ts")))).as("lifetime_us")),
      Some("""SELECT user_id, count(*) AS n_events,
             | min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us,
             | max(epoch_us(ts)) - min(epoch_us(ts)) AS lifetime_us
             |FROM events GROUP BY 1""".stripMargin),
      "contract lifetime span: SURVEY §2.4 J5, §2.5 A13"),

    // A10 (RQ1): entities with ≥1 destruction vs all
    "q09_rq1_destroyed" -> Q(
      (s, d) => events(s, d).groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
        .agg(
          sum(when(col("n_err") > 0, 1L).otherwise(0L)).as("n_destroyed"),
          count(lit(1)).as("n_total")),
      Some("""WITH per_user AS (
             |  SELECT user_id, sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS n_err
             |  FROM events GROUP BY 1)
             |SELECT CAST(sum(CASE WHEN n_err > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_destroyed,
             |       count(*) AS n_total
             |FROM per_user""".stripMargin),
      "RQ1 destroyed-vs-all: SURVEY §2.5 A10"),

    // A11 (RQ2): destroyed exactly once vs multiple times
    "q10_rq2_once_multi" -> Q(
      (s, d) => events(s, d).filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .agg(
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_once"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_multi")),
      Some("""WITH per_user AS (
             |  SELECT user_id, count(*) AS n FROM events WHERE event_type='error' GROUP BY 1)
             |SELECT CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_once,
             |       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi
             |FROM per_user""".stripMargin),
      "RQ2 once-vs-multiple: SURVEY §2.5 A11"),

    // J6 + A12 (RQ3): intra-group deploy×destroy pairing by time bucket
    "q11_rq3_pairs" -> Q(
      (s, d) => {
        val e = events(s, d)
        val dep = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("dep_ts"))
        val des = e.filter(col("event_type") === "error")
          .select(col("user_id").as("u2"), col("ts").as("des_ts"))
        dep.join(des, dep("user_id") === des("u2"))
          .select(
            col("user_id"),
            (to_date(col("dep_ts")) === to_date(col("des_ts"))).as("same_day"),
            (date_trunc("hour", col("dep_ts")) === date_trunc("hour", col("des_ts"))).as("same_hour"))
          .agg(
            sum(when(col("same_day"), 1L).otherwise(0L)).as("n_same_day"),
            sum(when(col("same_hour"), 1L).otherwise(0L)).as("n_same_hour"),
            countDistinct(when(col("same_day"), col("user_id"))).as("n_users_same_day"))
      },
      Some("""WITH dep AS (SELECT user_id, ts FROM events WHERE event_type='signup'),
             |     des AS (SELECT user_id, ts FROM events WHERE event_type='error'),
             |     p AS (
             |  SELECT dep.user_id,
             |         CAST(dep.ts AS DATE) = CAST(des.ts AS DATE) AS same_day,
             |         date_trunc('hour', dep.ts) = date_trunc('hour', des.ts) AS same_hour
             |  FROM dep JOIN des ON dep.user_id = des.user_id)
             |SELECT CAST(sum(CASE WHEN same_day THEN 1 ELSE 0 END) AS BIGINT) AS n_same_day,
             |       CAST(sum(CASE WHEN same_hour THEN 1 ELSE 0 END) AS BIGINT) AS n_same_hour,
             |       count(DISTINCT CASE WHEN same_day THEN user_id END) AS n_users_same_day
             |FROM p""".stripMargin),
      "RQ3 same-block/same-tx pairing: SURVEY §2.4 J6, §2.5 A12"),

    // native session windows: the engine-managed session assignment
    // (the streaming-capable form of q13's manual lag/cumsum sessions);
    // the oracle rebuilds identical sessions from first principles
    "q76_session_window" -> Q(
      (s, d) => events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts").cast("timestamp"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          col("n_events")),
      Some("""WITH o AS (
             |  SELECT user_id, ts,
             |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
             |  FROM events),
             |g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END AS is_new
             |  FROM o),
             |sid AS (
             |  SELECT user_id, ts,
             |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g)
             |SELECT user_id, min(epoch_us(ts)) AS session_start_us,
             |       count(*) AS n_events
             |FROM sid GROUP BY user_id, session_id""".stripMargin),
      "native session_window == manual gap sessions (batch face of streaming sessions)"),

    // semi-structured processing: typed JSON extraction from the props
    // payload (schema-on-read with from_json, not regex), aggregated
    "q79_json_extract" -> Q(
      (s, d) => {
        val schema = "k BIGINT, tag STRING"
        events(s, d)
          .select(col("event_type"),
            from_json(col("props"), schema, Map.empty[String, String]).as("p"))
          .groupBy(col("event_type"))
          .agg(count(col("p.k")).as("n_with_k"),
            sum(col("p.k")).as("sum_k"),
            countDistinct(col("p.tag")).as("n_tags"))
      },
      Some("""SELECT event_type,
             | count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
             | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             | count(DISTINCT props->>'$.tag') AS n_tags
             |FROM events GROUP BY 1""".stripMargin),
      "typed JSON extraction (from_json) over the props payload"),

    // A13 (RQ4): population lifetime statistics over destroyed+deployed
    // entities. All math runs on exact integer seconds; avg and
    // stddev_pop are derived from exact sums with an identical double
    // operation sequence on both engines (F13's ÷n semantics).
    "q47_rq4_stats" -> Q(
      (s, d) => {
        val e = events(s, d)
        val lives = e.groupBy(col("user_id")).agg(
            min(when(col("event_type") === "signup", epochUs(col("ts")))).as("dep_us"),
            max(when(col("event_type") === "error", epochUs(col("ts")))).as("des_us"))
          .where(col("dep_us").isNotNull && col("des_us").isNotNull &&
            col("des_us") >= col("dep_us"))
          .select(((col("des_us") - col("dep_us")) / 1000000L).cast("long").as("life_s"))
        lives.agg(
            count(lit(1)).as("n"),
            sum(col("life_s")).as("s"),
            sum(col("life_s") * col("life_s")).as("sq"))
          .select(
            col("n").as("n_lived"),
            round(col("s").cast("double") / col("n"), 6).as("avg_life_s"),
            round(sqrt(col("sq").cast("double") / col("n") -
              (col("s").cast("double") / col("n")) * (col("s").cast("double") / col("n"))), 6)
              .as("std_life_s"))
      },
      Some("""WITH per_user AS (
             |  SELECT user_id,
             |         min(CASE WHEN event_type='signup' THEN epoch_us(ts) END) AS dep_us,
             |         max(CASE WHEN event_type='error' THEN epoch_us(ts) END) AS des_us
             |  FROM events GROUP BY 1),
             |lives AS (
             |  SELECT (des_us - dep_us) // 1000000 AS life_s FROM per_user
             |  WHERE dep_us IS NOT NULL AND des_us IS NOT NULL AND des_us >= dep_us),
             |agg AS (
             |  SELECT count(*) AS n, CAST(sum(life_s) AS BIGINT) AS s,
             |         CAST(sum(life_s * life_s) AS BIGINT) AS sq
             |  FROM lives)
             |SELECT n AS n_lived,
             |       round(CAST(s AS DOUBLE) / n, 6) AS avg_life_s,
             |       round(sqrt(CAST(sq AS DOUBLE) / n -
             |             (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6) AS std_life_s
             |FROM agg""".stripMargin),
      "RQ4 population lifetime stats (exact-sum avg + stddev_pop)"),

    // W1: min_by/max_by per group via window row_number
    "q12_first_last" -> Q(
      (s, d) => {
        val asc = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        val desc = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
        events(s, d)
          .withColumn("rn_a", row_number().over(asc))
          .withColumn("rn_d", row_number().over(desc))
          .groupBy(col("user_id"))
          .agg(
            max(when(col("rn_a") === 1, col("event_type"))).as("first_type"),
            max(when(col("rn_d") === 1, col("event_type"))).as("last_type"))
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
             |  FROM events)
             |SELECT user_id,
             |       max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
             |       max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type
             |FROM r GROUP BY 1""".stripMargin),
      "earliest/latest per key: SURVEY §2.6 W1"),

    // W4: lead/lag sessionization (gap > 1h starts a new session)
    "q13_sessions" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        events(s, d)
          .withColumn("prev_us", lag(epochUs(col("ts")), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull || epochUs(col("ts")) - col("prev_us") > 3600000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("is_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id")).agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(max(col("session_id")).as("n_sessions"), max(col("n")).as("max_session_events"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id,
             |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
             |  FROM events),
             |g AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END AS is_new
             |  FROM o),
             |s AS (
             |  SELECT user_id,
             |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g),
             |c AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
             |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, max(n) AS max_session_events
             |FROM c GROUP BY 1""".stripMargin),
      "lead/lag sessionization: SURVEY §2.6 W4"),

    // P4/P6 + F15-ish: selector projection, zero-default, JSON field pull
    "q16_selectors" -> Q(
      (s, d) => events(s, d).select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("bigint").as("k"),
        coalesce(when(col("value") >= 10.0, col("event_type")), lit("none")).as("typed")),
      Some("""SELECT event_id,
             | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
             | coalesce(CASE WHEN value >= 10.0 THEN event_type END, 'none') AS typed
             |FROM events""".stripMargin),
      "row transforms: SURVEY §2.3 P4/P6, F15 JSON pull"))
}
