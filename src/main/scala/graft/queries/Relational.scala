package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Relational operators from SURVEY.md §2 restated over the driver's
  * TPC-H-ish tables (FIXTURES.md §C): per-group gas-price-style stats
  * (A1/A2/F13), signature dedup (A3/K3), max-indexed-block (A14/W2),
  * top-k (W2), FK star joins (J3/J4), semi/anti joins (J2 and the
  * stream's insert-if-absent), and the account-dimension union (§2.7).
  */
object Relational {

  /** Exact population std-dev via decimal sums: sqrt(E[x²] − E[x]²) with
    * order-independent decimal accumulation, so Spark and DuckDB agree
    * bit-for-bit. Mirrors the reference's ÷n semantics (block.rs:57-59). */
  private def stddevPopExact(x: Column, n: Column): Column = {
    val d = x.cast("decimal(18,2)")
    val s1 = sum(d).cast("double")
    val s2 = sum(d * d).cast("double")
    sqrt(s2 / n - (s1 / n) * (s1 / n))
  }

  private val stdSql =
    """sqrt(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*)
      | - (CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*))
      | * (CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*)))""".stripMargin.replace("\n", "")

  def defs: Map[String, Q] = Map(
    // A1/A2/F13: per-block gas statistics — min/max/avg/stddev_pop + count
    "q01_group_stats" -> Q(
      (s, d) => {
        val li = lineitem(s, d)
        val n = count(lit(1))
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          n.as("n_tx"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / n, 6).as("avg_price"),
          round(stddevPopExact(col("l_extendedprice"), n), 6).as("std_price"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n_tx, sum(l_quantity) AS sum_qty,
              | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
              | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*), 6) AS avg_price,
              | round($stdSql, 6) AS std_price
              |FROM lineitem GROUP BY 1, 2""".stripMargin),
      "block gas stats analog: SURVEY §2.5 A1/A2, F13 population stddev"),

    // A3/K3: global signature dedup (dropDuplicates before the sink)
    "q02_distinct_signatures" -> Q(
      (s, d) => lineitem(s, d).select("l_returnflag", "l_linestatus").dropDuplicates(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),
      "signature dedup analog: SURVEY §2.5 A3 / sink gate K3"),

    // A14/A15: max indexed block + run counters
    "q03_max_indexed" -> Q(
      (s, d) => orders(s, d).agg(
        max(col("o_orderkey")).as("max_block"),
        count(lit(1)).as("n_rows")),
      Some("SELECT max(o_orderkey) AS max_block, count(*) AS n_rows FROM orders"),
      "max-indexed-block analog: SURVEY §2.5 A14/A15"),

    // W2: top-1 block by number desc, generalized to top-5 (TakeOrdered)
    "q04_top_k" -> Q(
      (s, d) => orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(5),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin),
      "ordered limit: SURVEY §2.6 W2"),

    // J4: natural-key FK resolution joins (Account/Block/Tx dimension star)
    "q05_star_join" -> Q(
      (s, d) => {
        val o = orders(s, d)
        val c = broadcast(customer(s, d))
        val n = broadcast(nation(s, d))
        val r = broadcast(region(s, d))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_orders,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2""".stripMargin),
      "FK star join with broadcast dims: SURVEY §2.4 J3/J4"),

    // J2: semi join (failed-tx set membership)
    "q06_semi_join" -> Q(
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      },
      Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1""".stripMargin),
      "left-semi join: SURVEY §2.4 J2"),

    // anti join: insert-only-when-absent (stream.rs:214-246)
    "q07_anti_join" -> Q(
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      },
      Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1""".stripMargin),
      "left-anti join: SURVEY §2.4 notes (insert-if-absent)"),

    // §2.7: account-dimension UNION DISTINCT over address-bearing columns
    "q14_union_dim" -> Q(
      (s, d) => customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
        .union(supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
        .distinct(),
      Some("""SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
             |UNION
             |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""".stripMargin),
      "account dim union distinct: SURVEY §2.7"),

    // the spark.sql(...) surface: same engine, SQL text in — registered
    // to prove the catalog/view path works alongside the DataFrame API
    "q17_sql_api" -> Q(
      (s, d) => {
        orders(s, d).createOrReplaceTempView("v_orders")
        lineitem(s, d).createOrReplaceTempView("v_lineitem")
        s.sql("""SELECT o_orderpriority,
                |       count(*) AS n_orders,
                |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
                |FROM v_orders JOIN v_lineitem ON l_orderkey = o_orderkey
                |GROUP BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
             |GROUP BY 1""".stripMargin),
      "spark.sql over temp views: the SQL API surface"),

    // exact uint256 arithmetic (SURVEY §1.3/§7.5-1): money columns live
    // as decimal strings because they exceed Decimal(38); Uint256Sum
    // (TypedImperativeAggregate over BigInteger) sums them exactly with
    // map-side partial aggregation. Wei-scale values are built by
    // appending 9 zeros to an exact cents amount — per-group totals
    // overflow int64, so the oracle must go through HUGEINT.
    "q19_uint256_sum" -> Q(
      (s, d) => orders(s, d)
        .withColumn("wei", concat(
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").cast("string"),
          lit("000000000")))
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.Uint256.sum(col("wei")).as("total_wei"),
          count(lit(1)).as("n_orders")),
      Some("""SELECT o_orderpriority,
             | CAST(sum(CAST(concat(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), '000000000') AS HUGEINT)) AS VARCHAR) AS total_wei,
             | count(*) AS n_orders
             |FROM orders GROUP BY 1""".stripMargin),
      "exact uint256 string-sum via custom TypedImperativeAggregate"),

    // uint256 ORDERING without leaving codegen: non-negative decimal
    // strings compare numerically once left-padded to 78 digits (the
    // max-uint256 width) — the reference's balance_left / value sorting
    // semantics (U256→decimal string, contract_destruction.rs) as plain
    // min/max aggregates. Values are 24+ digits, beyond any int64.
    "q94_uint256_minmax" -> Q(
      (s, d) => {
        val v = concat(col("p_partkey").cast("string"), lit("9" * 20))
        // strip-then-restore-zero: '^0+' on an all-zero pad would yield
        // '' — coalesce(nullif(…)) keeps a literal uint256 zero as "0"
        def unpad(c: Column) =
          coalesce(nullif(regexp_replace(c, "^0+", ""), lit("")), lit("0"))
        part(s, d)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            unpad(min(lpad(v, 78, "0"))).as("min_val"),
            unpad(max(lpad(v, 78, "0"))).as("max_val"))
      },
      Some(s"""SELECT p_brand, count(*) AS n,
              | coalesce(nullif(regexp_replace(min(lpad(CAST(p_partkey AS VARCHAR) || '${"9" * 20}', 78, '0')), '^0+', ''), ''), '0') AS min_val,
              | coalesce(nullif(regexp_replace(max(lpad(CAST(p_partkey AS VARCHAR) || '${"9" * 20}', 78, '0')), '^0+', ''), ''), '0') AS max_val
              |FROM part GROUP BY 1""".stripMargin),
      "uint256 numeric ordering via fixed-width pad (U3 ordering surface)"),

    // exact interpolated percentiles (gas-stats flavor beyond A1's
    // min/max/avg/stddev): Spark percentile() and DuckDB quantile_cont
    // share the linear-interpolation definition
    "q54_percentiles" -> Q(
      (s, d) => orders(s, d).groupBy(col("o_orderpriority")).agg(
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95"),
        count(lit(1)).as("n")),
      Some("""SELECT o_orderpriority,
             | round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
             | round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
             | count(*) AS n
             |FROM orders GROUP BY 1""".stripMargin),
      "exact interpolated percentiles per group"),

    // rollup: region → nation → grand-total hierarchy in one pass
    // (multi-level aggregation Spark gives for free; DuckDB ROLLUP
    // mirrors the grouping-id semantics)
    "q55_rollup" -> Q(
      (s, d) => {
        val c = customer(s, d)
        val n = nation(s, d)
        val r = region(s, d)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
             | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)""".stripMargin),
      "rollup hierarchy aggregation (region -> nation -> total)"),

    // cube: all 2^2 grouping combinations in one pass (rollup's sibling)
    "q69_cube" -> Q(
      (s, d) => orders(s, d)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price")),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin),
      "cube aggregation over all grouping combinations"),

    // skew-safe aggregation under the oracle gate: the salted two-phase
    // count must be indistinguishable from the plain group count
    "q56_salted_agg" -> Q(
      (s, d) => graft.ops.Skew.saltedCount(
        events(s, d), "event_type", buckets = 16,
        saltSource = col("event_id"))
        .select(col("event_type"), col("count").as("n_events")),
      Some("""SELECT event_type, count(*) AS n_events
             |FROM events GROUP BY 1""".stripMargin),
      "salted two-phase aggregation == plain aggregation (skew path)"),

    // statistical aggregates from exact sums: Pearson correlation per
    // group derived from DECIMAL(38) power sums — streaming corr()
    // implementations round differently across engines, exact sums
    // with one identical double sequence at the end do not
    "q86_corr" -> Q(
      (s, d) => {
        val x = (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(19,0)")
        val y = col("o_orderkey").cast("decimal(19,0)")
        orders(s, d).groupBy(col("o_orderpriority")).agg(
            count(lit(1)).as("n"),
            sum(x).cast("decimal(38,0)").as("sx"),
            sum(y).cast("decimal(38,0)").as("sy"),
            sum((x * y).cast("decimal(38,0)")).as("sxy"),
            sum((x * x).cast("decimal(38,0)")).as("sxx"),
            sum((y * y).cast("decimal(38,0)")).as("syy"))
          .select(col("o_orderpriority"), col("n"),
            round(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                  sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
              .as("pearson"))
      },
      Some("""WITH a AS (
             |  SELECT o_orderpriority, count(*) AS n,
             |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
             |    CAST(sum(CAST(o_orderkey AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
             |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) * CAST(o_orderkey AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS sxy,
             |    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS sxx,
             |    sum(CAST(CAST(o_orderkey AS DECIMAL(19,0)) * CAST(o_orderkey AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS syy
             |  FROM orders GROUP BY 1)
             |SELECT o_orderpriority, n,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
             |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS pearson
             |FROM a""".stripMargin),
      "Pearson correlation from exact decimal power sums"),

    // data-quality profiling: per-column null/distinct/min/max summary
    // in ONE scan (wide aggregate unpivoted to rows) — the profiling
    // pass a training-data pipeline runs before ingestion
    "q80_profile" -> Q(
      (s, d) => {
        // one pruned single-column scan per profiled column, unioned —
        // a single wide agg with N countDistincts plans an N-way Expand
        // of every row (N x the shuffle), which benched 4x slower
        val li = lineitem(s, d)
        def prof(c: String) = li.select(col(c))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_s"),
            max(col(c)).cast("string").as("max_s"))
          .select(col("n_rows"), lit(c).as("col_name"), col("n_nulls"),
            col("n_distinct"), col("min_s"), col("max_s"))
        Seq("l_quantity", "l_returnflag", "l_suppkey").map(prof).reduce(_ unionByName _)
      },
      Some("""WITH n AS (SELECT count(*) AS n_rows FROM lineitem)
             |SELECT n_rows, 'l_quantity' AS col_name,
             |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  count(DISTINCT l_quantity) AS n_distinct,
             |  CAST(min(l_quantity) AS VARCHAR) AS min_s, CAST(max(l_quantity) AS VARCHAR) AS max_s
             |FROM lineitem, n GROUP BY n_rows
             |UNION ALL
             |SELECT n_rows, 'l_returnflag',
             |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  count(DISTINCT l_returnflag),
             |  CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
             |FROM lineitem, n GROUP BY n_rows
             |UNION ALL
             |SELECT n_rows, 'l_suppkey',
             |  CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  count(DISTINCT l_suppkey),
             |  CAST(min(l_suppkey) AS VARCHAR), CAST(max(l_suppkey) AS VARCHAR)
             |FROM lineitem, n GROUP BY n_rows""".stripMargin),
      "one-scan column profiling (nulls/distinct/min/max per column)"),

    // skew-safe join under the oracle gate: the salted replicated-dim
    // join must be indistinguishable from the plain join (oracle = the
    // plain SQL join + aggregate)
    "q78_salted_join" -> Q(
      (s, d) => graft.ops.Skew.saltedJoin(
          lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
          supplier(s, d).select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          "l_suppkey", buckets = 8, saltSource = col("l_orderkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty")),
      Some("""SELECT s_nationkey, count(*) AS n_items,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY 1""".stripMargin),
      "salted replicated-dim join == plain join (skew path, join side)"),

    // analytic window frames: per-user running count and 3-row moving
    // average over event time (frame specs beyond W1-W4's rank/limit)
    "q57_window_frames" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts"),
            col("value").cast("decimal(18,2)").as("v"))
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0))
              .as("running_n"),
            sum(col("v")).over(w.rowsBetween(-2, 0))
              .cast("double").as("mov_sum3"))
      },
      Some("""SELECT event_id, user_id,
             | count(*) OVER w AS running_n,
             | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),
      "window frame specs: running count + bounded moving sum"),

    // pivot reshape: per-user event-type counts as columns (explicit
    // value list so the plan is a single pass, no distinct-values
    // pre-query; oracle = conditional aggregation, same column names)
    "q58_pivot" -> Q(
      (s, d) => events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L),
      Some("""SELECT user_id,
             | count(*) FILTER (event_type = 'click') AS click,
             | count(*) FILTER (event_type = 'view') AS view,
             | count(*) FILTER (event_type = 'purchase') AS purchase,
             | count(*) FILTER (event_type = 'signup') AS signup,
             | count(*) FILTER (event_type = 'error') AS error
             |FROM events GROUP BY 1""".stripMargin),
      "pivot to per-type count columns (single-pass, explicit values)"),

    // ranking-function family over a deterministic total order
    "q59_rank_family" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        orders(s, d).select(
          col("o_orderkey"), col("o_orderpriority"),
          row_number().over(w).as("rn"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             | row_number() OVER w AS rn,
             | ntile(4) OVER w AS quartile,
             | round(percent_rank() OVER w, 6) AS pr,
             | round(cume_dist() OVER w, 6) AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin),
      "row_number/ntile/percent_rank/cume_dist over one window"),

    // A7/J7 with a full oracle: Jaccard similarity over interface-name
    // sets (brand -> set of part types), upper-triangle pairs. The
    // set sizes are exact integers on both engines, so the similarity
    // is deterministic (q44 keeps the bytecode-flavored rows-only twin).
    "q67_interface_jaccard" -> Q(
      (s, d) => {
        val sets = part(s, d).groupBy(col("p_brand"))
          .agg(collect_set(col("p_type")).as("types"))
        val a = sets.toDF("a_brand", "a_types")
        val b = sets.toDF("b_brand", "b_types")
        a.join(b, col("a_brand") < col("b_brand"))
          .select(col("a_brand"), col("b_brand"),
            size(array_intersect(col("a_types"), col("b_types"))).cast("long").as("n_inter"),
            size(array_union(col("a_types"), col("b_types"))).cast("long").as("n_union"))
          .withColumn("jaccard",
            round(col("n_inter").cast("double") / col("n_union"), 6))
      },
      Some("""WITH s AS (SELECT DISTINCT p_brand, p_type FROM part),
             |sz AS (SELECT p_brand, count(*) AS n FROM s GROUP BY 1),
             |inter AS (
             |  SELECT a.p_brand AS a_brand, b.p_brand AS b_brand, count(*) AS n_inter
             |  FROM s a JOIN s b ON a.p_type = b.p_type AND a.p_brand < b.p_brand
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT sa.p_brand AS a_brand, sb.p_brand AS b_brand,
             |         coalesce(i.n_inter, 0) AS n_inter,
             |         sa.n + sb.n - coalesce(i.n_inter, 0) AS n_union
             |  FROM sz sa JOIN sz sb ON sa.p_brand < sb.p_brand
             |  LEFT JOIN inter i ON i.a_brand = sa.p_brand AND i.b_brand = sb.p_brand)
             |SELECT a_brand, b_brand, CAST(n_inter AS BIGINT) AS n_inter,
             |       CAST(n_union AS BIGINT) AS n_union,
             |       round(CAST(n_inter AS DOUBLE) / n_union, 6) AS jaccard
             |FROM pairs""".stripMargin),
      "interface-set Jaccard pairs with exact set arithmetic: A7/J7"),

    // A8/A9: compliancy score — membership count against a literal set
    "q15_compliancy" -> Q(
      (s, d) => part(s, d).groupBy(col("p_brand")).agg(
        countDistinct(when(col("p_type").isin(
          "ECONOMY", "STANDARD", "LARGE", "MEDIUM", "PROMO"), col("p_type")))
          .as("compliancy"),
        count(lit(1)).as("n_parts")),
      Some("""SELECT p_brand,
             | count(DISTINCT CASE WHEN p_type IN ('ECONOMY','STANDARD','LARGE','MEDIUM','PROMO') THEN p_type END) AS compliancy,
             | count(*) AS n_parts
             |FROM part GROUP BY 1""".stripMargin),
      "ERC-20/721 compliancy analog: SURVEY §2.5 A8/A9"))
}
