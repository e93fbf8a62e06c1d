package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{EventOps, LayoutOps}
import graft.sources.Tables

/** OLAP analytics surface beyond the reference's executable set: multi-level
  * aggregation (ROLLUP / CUBE / GROUPING SETS), pivot, statistical
  * aggregates, exact percentiles, and the full window-frame vocabulary.
  *
  * The reference parses GROUP BY but plans only plain grouping
  * (`qurious/src/planner/sql.rs:550-662`); everything here is "beyond
  * reference" surface a user of a complete engine expects, implemented as
  * single declarative plans: one shuffle per grouping pass (Spark expands
  * ROLLUP/CUBE into a single Expand + one hash aggregate, not one shuffle
  * per grouping set) and one window exchange per partition key. At 100 TB
  * nothing here materializes on the driver.
  *
  * Determinism for the DuckDB hash-oracle follows Tpch.scala: money doubles
  * are decimal-cast before summing (exact, associative), true floating-point
  * statistics are rounded, every query ends in a total ORDER BY.
  */
object Analytics extends QueryModule {

  private val money = DecimalType(12, 2)
  private def m(c: Column): Column = c.cast(money)
  private def M(c: String) = s"CAST($c AS DECIMAL(12,2))"
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  def defs: Seq[QueryDef] = Seq(
    // ---- ROLLUP: hierarchy totals in ONE pass (Expand + single hash agg;
    // the naive alternative — N grouped queries UNION'd — is N shuffles) ----
    QueryDef(
      "an_rollup",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(
            sum(m($"l_quantity")).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(
            $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(sum(${M("l_quantity")}) AS DOUBLE) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- CUBE: all 2^k grouping combinations, still one Expand pass ----
    QueryDef(
      "an_cube",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(
            sum(m($"o_totalprice")).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(
            $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority,
        CAST(sum(${M("o_totalprice")}) AS DOUBLE) AS revenue, count(*) AS n_orders
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // ---- GROUPING SETS with explicit grouping_id disambiguation ----
    QueryDef(
      "an_grouping_sets",
      (s, dir) => {
        import s.implicits._
        // (flag), (status), and grand total — spark.sql GROUPING SETS form
        t(s, dir, "lineitem").createOrReplaceTempView("an_gs_lineitem")
        s.sql(s"""SELECT l_returnflag, l_linestatus,
            CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
            CAST(grouping(l_returnflag) AS INT) AS g_flag,
            CAST(grouping(l_linestatus) AS INT) AS g_status
          FROM an_gs_lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(sum(${M("l_quantity")}) AS DOUBLE) AS sum_qty,
        CAST(grouping(l_returnflag) AS INT) AS g_flag,
        CAST(grouping(l_linestatus) AS INT) AS g_status
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- PIVOT: event_type → columns. Spark's relational pivot with an
    // explicit value list (no extra distinct-discovery job); oracle is the
    // equivalent conditional aggregation ----
    QueryDef(
      "an_pivot_events",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(($"user_id" % 10).cast("bigint").as("user_bucket"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy($"user_bucket")
      },
      Some("""SELECT user_id % 10 AS user_bucket,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY 1 ORDER BY user_bucket""")),

    // ---- UNPIVOT (wide → long): the inverse of pivot, as a zero-shuffle
    // row expansion; oracle is the equivalent stacked UNION ALL ----
    QueryDef(
      "an_unpivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .filter($"p_partkey" < 200)
          .select($"p_partkey",
            $"p_size".cast("double").as("size"),
            $"p_retailprice".as("retail"))
          .unpivot(Array($"p_partkey"), Array($"size", $"retail"), "metric", "value")
          .orderBy($"p_partkey", $"metric")
      },
      Some("""SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part WHERE p_partkey < 200
        UNION ALL
        SELECT p_partkey, 'retail' AS metric, p_retailprice AS value
        FROM part WHERE p_partkey < 200
        ORDER BY p_partkey, metric""")),

    // ---- Statistical aggregates (one map-side-combinable pass) ----
    QueryDef(
      "an_stats_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
            round(stddev_pop($"l_quantity"), 4).as("sdp_qty"),
            round(var_samp($"l_discount"), 4).as("var_disc"),
            round(var_pop($"l_discount"), 4).as("varp_disc"),
            round(corr($"l_extendedprice", $"l_quantity"), 4).as("corr_pq"),
            round(covar_samp($"l_quantity", $"l_discount"), 4).as("cov_qd"),
            round(covar_pop($"l_quantity", $"l_discount"), 4).as("covp_qd"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
        round(stddev_samp(l_quantity), 4) AS sd_qty,
        round(stddev_pop(l_quantity), 4) AS sdp_qty,
        round(var_samp(l_discount), 4) AS var_disc,
        round(var_pop(l_discount), 4) AS varp_disc,
        round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
        round(covar_samp(l_quantity, l_discount), 4) AS cov_qd,
        round(covar_pop(l_quantity, l_discount), 4) AS covp_qd
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- per-user running z-score anomaly flags (prior-only moments, no
    // leakage): value more than 3 running stddevs from the mean of ≥ 5
    // PRIOR events. Integer-cent moments make the inequality pure integer
    // arithmetic — bit-identical on any engine or window implementation.
    // The streaming twin (StreamingOps.anomalyStream) carries (n,s1,s2)
    // as keyed state; StreamingSpec proves the identical flag set. ----
    QueryDef(
      "an_anomaly_running",
      (s, dir) => {
        import s.implicits._
        EventOps.runningAnomalies(t(s, dir, "events"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, ts,
            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          FROM events),
        r AS (
          SELECT user_id, event_id, c,
            count(*) OVER w AS n_pre,
            coalesce(CAST(sum(c) OVER w AS BIGINT), 0) AS s1,
            coalesce(CAST(sum(c * c) OVER w AS BIGINT), 0) AS s2
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT user_id, event_id FROM r
        WHERE n_pre >= 5
          AND (c * n_pre - s1) * (c * n_pre - s1) > 9 * (n_pre * s2 - s1 * s1)
        ORDER BY user_id, event_id""")),

    // ---- equi-width histogram (profiling primitive): 20 buckets over
    // o_totalprice, bounds broadcast from ONE min/max aggregate — integer
    // bucket arithmetic on exact decimal inputs so edges are
    // engine-agnostic; the max value folds into the last bucket ----
    QueryDef(
      "an_histogram",
      (s, dir) => {
        import s.implicits._
        // integer-cent arithmetic end to end: decimal division scale rules
        // differ across engines, integer div does not
        val o = t(s, dir, "orders")
          .select((m($"o_totalprice") * 100).cast("long").as("c"))
        val bounds = o.agg(min($"c").as("lo"), max($"c").as("hi"))
        o.crossJoin(broadcast(bounds))
          .withColumn("bucket",
            least(expr("((c - lo) * 20) div (hi - lo)"), lit(19L)).cast("int"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            round(min($"c").cast("double") / 100, 2).as("bucket_min"),
            round(max($"c").cast("double") / 100, 2).as("bucket_max"))
          .orderBy($"bucket")
      },
      Some("""WITH o AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          FROM orders),
        b AS (SELECT min(c) AS lo, max(c) AS hi FROM o),
        x AS (
          SELECT CAST(least(((c - lo) * 20) // (hi - lo), 19) AS INT) AS bucket, c
          FROM o CROSS JOIN b)
        SELECT bucket, count(*) AS n,
          round(CAST(min(c) AS DOUBLE) / 100, 2) AS bucket_min,
          round(CAST(max(c) AS DOUBLE) / 100, 2) AS bucket_max
        FROM x GROUP BY bucket ORDER BY bucket""")),

    // ---- column-profile report (the dbt/Deequ-style profiling pass a
    // pipeline runs before trusting a new table): null counts, distinct
    // cardinalities, min/max — ONE aggregate over the table (Catalyst
    // expands the multi-distinct internally), unpivoted to a row per
    // column via stack. min/max stringified so one report shape covers
    // every column type. ----
    QueryDef(
      "an_profile_columns",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val ag = o.agg(
          count(lit(1)).as("n_rows"),
          sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("k_nulls"),
          countDistinct($"o_custkey").as("k_d"),
          min($"o_custkey").cast("string").as("k_min"),
          max($"o_custkey").cast("string").as("k_max"),
          sum(when($"o_totalprice".isNull, 1L).otherwise(0L)).as("p_nulls"),
          countDistinct(m($"o_totalprice")).as("p_d"),
          min(m($"o_totalprice")).cast("string").as("p_min"),
          max(m($"o_totalprice")).cast("string").as("p_max"),
          sum(when($"o_orderdate".isNull, 1L).otherwise(0L)).as("d_nulls"),
          countDistinct($"o_orderdate").as("d_d"),
          min($"o_orderdate").cast("string").as("d_min"),
          max($"o_orderdate").cast("string").as("d_max"),
          sum(when($"o_orderpriority".isNull, 1L).otherwise(0L)).as("y_nulls"),
          countDistinct($"o_orderpriority").as("y_d"),
          min($"o_orderpriority").cast("string").as("y_min"),
          max($"o_orderpriority").cast("string").as("y_max"))
        ag.select($"n_rows", expr("""stack(4,
            'o_custkey', k_nulls, k_d, k_min, k_max,
            'o_orderdate', d_nulls, d_d, d_min, d_max,
            'o_orderpriority', y_nulls, y_d, y_min, y_max,
            'o_totalprice', p_nulls, p_d, p_min, p_max)
            AS (col_name, n_nulls, n_distinct, min_value, max_value)"""))
          .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct",
            $"min_value", $"max_value")
          .orderBy($"col_name")
      },
      Some("""WITH a AS (
          SELECT count(*) AS n_rows,
            CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
            count(DISTINCT o_custkey) AS k_d,
            CAST(min(o_custkey) AS VARCHAR) AS k_min,
            CAST(max(o_custkey) AS VARCHAR) AS k_max,
            CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
            count(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))) AS p_d,
            CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS p_min,
            CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS p_max,
            CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
            count(DISTINCT o_orderdate) AS d_d,
            CAST(min(o_orderdate) AS VARCHAR) AS d_min,
            CAST(max(o_orderdate) AS VARCHAR) AS d_max,
            CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS y_nulls,
            count(DISTINCT o_orderpriority) AS y_d,
            CAST(min(o_orderpriority) AS VARCHAR) AS y_min,
            CAST(max(o_orderpriority) AS VARCHAR) AS y_max
          FROM orders)
        SELECT col_name, n_rows, n_nulls, n_distinct, min_value, max_value
        FROM (
          SELECT 'o_custkey' AS col_name, n_rows, k_nulls AS n_nulls,
                 k_d AS n_distinct, k_min AS min_value, k_max AS max_value FROM a
          UNION ALL
          SELECT 'o_orderdate', n_rows, d_nulls, d_d, d_min, d_max FROM a
          UNION ALL
          SELECT 'o_orderpriority', n_rows, y_nulls, y_d, y_min, y_max FROM a
          UNION ALL
          SELECT 'o_totalprice', n_rows, p_nulls, p_d, p_min, p_max FROM a)
        ORDER BY col_name""")),

    // ---- Exact percentiles / median (linear interpolation both engines) ----
    QueryDef(
      "an_percentiles",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
            round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        round(quantile_cont(o_totalprice, 0.95), 4) AS p95
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Window frames: ROWS BETWEEN moving aggregate + edge values.
    // One exchange on the partition key serves all four functions ----
    QueryDef(
      "an_window_frames",
      (s, dir) => {
        import s.implicits._
        val byCust = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
        val moving = byCust.rowsBetween(-2, 0)
        val full = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .filter($"o_custkey" < 200)
          .select(
            $"o_custkey", $"o_orderkey",
            sum(m($"o_totalprice")).over(moving).cast("double").as("moving_sum3"),
            first(m($"o_totalprice")).over(full).cast("double").as("first_price"),
            last(m($"o_totalprice")).over(full).cast("double").as("last_price"),
            lag(m($"o_totalprice"), 1).over(byCust).cast("double").as("prev_price"),
            lead(m($"o_totalprice"), 1).over(byCust).cast("double").as("next_price"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey,
        CAST(sum(${M("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
        CAST(first_value(${M("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS first_price,
        CAST(last_value(${M("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_price,
        CAST(lag(${M("o_totalprice")}, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
          AS DOUBLE) AS prev_price,
        CAST(lead(${M("o_totalprice")}, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
          AS DOUBLE) AS next_price
        FROM orders WHERE o_custkey < 200 ORDER BY o_custkey, o_orderkey""")),

    // ---- value-based RANGE frame: peers by value distance, not row
    // position (deterministic even under order ties — the frame is defined
    // on the value axis) ----
    QueryDef(
      "an_window_range_frame",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("an_rf_orders")
        s.sql("""SELECT o_orderkey, o_orderpriority, o_totalprice,
          count(*) OVER w AS n_within_10k,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_within_10k
          FROM an_rf_orders WHERE o_orderkey < 2000
          WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                       RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
          ORDER BY o_orderkey""")
      },
      Some(s"""SELECT o_orderkey, o_orderpriority, o_totalprice,
        count(*) OVER w AS n_within_10k,
        CAST(sum(${M("o_totalprice")}) OVER w AS DOUBLE) AS sum_within_10k
        FROM orders WHERE o_orderkey < 2000
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                     RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey""")),

    // ---- Ranking family: ntile / percent_rank / cume_dist / dense_rank.
    // Unique (suppkey) order key keeps every rank deterministic ----
    QueryDef(
      "an_window_ranking",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey")
        t(s, dir, "supplier")
          .select(
            $"s_nationkey", $"s_suppkey",
            row_number().over(w).as("rn"),
            dense_rank().over(w).as("drk"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy($"s_nationkey", $"rn")
      },
      Some("""SELECT s_nationkey, s_suppkey,
        row_number() OVER w AS rn,
        dense_rank() OVER w AS drk,
        ntile(4) OVER w AS quartile,
        round(percent_rank() OVER w, 6) AS pct_rank,
        round(cume_dist() OVER w, 6) AS cume
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        ORDER BY s_nationkey, rn""")),

    // ---- Approximate aggregates: the sketches that replace exact
    // distinct/percentile at 100 TB (HLL++ and t-digest-style quantiles are
    // mergeable — map-side partials, no row shipping). Sketch internals are
    // engine-specific so there is no DuckDB hash-oracle; AnalyticsSpec
    // asserts relative error vs the exact answers instead ----
    QueryDef(
      "an_approx_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            approx_count_distinct($"o_custkey", rsd = 0.02).as("approx_cust"),
            expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx_median"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      },
      None,
      noOracleReason = Some(
        "approx_count_distinct (HLL++) and approx_percentile (KLL-ish) are " +
        "estimate-by-design with engine-internal sketch layouts; exact " +
        "counterparts are oracle-checked elsewhere (an_percentiles, " +
        "op_agg_distinct) and AnalyticsSpec bounds the relative error vs those " +
        "exact answers.")),

    // ---- Conditional aggregation (FILTER-style, as CASE for parity) ----
    QueryDef(
      "an_agg_conditional",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("n_total"),
            count(when($"o_orderstatus" === "F", 1)).as("n_finished"),
            sum(when($"o_orderstatus" === "O", m($"o_totalprice")))
              .cast("double").as("open_revenue"),
            max(when($"o_totalprice" > 100000, $"o_orderkey")).as("max_big_order"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
        count(*) AS n_total,
        count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN ${M("o_totalprice")} END) AS DOUBLE)
          AS open_revenue,
        max(CASE WHEN o_totalprice > 100000 THEN o_orderkey END) AS max_big_order
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- collection aggregates: collect_list / string_agg. Both are
    // order-nondeterministic across partitions, so results are sorted
    // inside the aggregate output before comparison (the only reproducible
    // contract for a distributed collect) ----
    QueryDef(
      "an_agg_collect",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "nation")
          .groupBy($"n_regionkey")
          .agg(
            count(lit(1)).as("n"),
            concat_ws(",", sort_array(collect_list($"n_name"))).as("nations_csv"),
            concat_ws(",", sort_array(collect_set(($"n_nationkey" % 5).cast("bigint"))))
              .as("key_mods_csv"))
          .orderBy($"n_regionkey")
      },
      // array payloads serialize to CSV so the cross-engine compare stays
      // scalar (list-typed cells compare differently across arrow/pandas)
      Some("""SELECT n_regionkey, count(*) AS n,
        array_to_string(list_sort(list(n_name)), ',') AS nations_csv,
        array_to_string(list_sort(list(DISTINCT n_nationkey % 5)), ',') AS key_mods_csv
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- ordered funnel conversion (signup → view ≤2d → purchase ≤1d):
    // each stage is a user-keyed aggregate joined to the previous stage's
    // first-event time, so ordering is enforced by timestamp comparison,
    // not sessionization state. Three user_id-keyed shuffles total; stage
    // counts are one-row aggregates. The canonical product-analytics
    // funnel, expressed as joins a 1000-executor cluster partitions by
    // user. ----
    QueryDef(
      "an_funnel_conversion",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val s1 = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("t1"))
        val s2 = ev.filter($"event_type" === "view")
          .join(s1, Seq("user_id"))
          .filter($"ts" > $"t1" && $"ts" <= $"t1" + expr("INTERVAL 2 DAYS"))
          .groupBy($"user_id").agg(min($"ts").as("t2"))
        val s3 = ev.filter($"event_type" === "purchase")
          .join(s2, Seq("user_id"))
          .filter($"ts" > $"t2" && $"ts" <= $"t2" + expr("INTERVAL 1 DAYS"))
          .groupBy($"user_id").agg(min($"ts").as("t3"))
        s1.agg(count(lit(1)).as("n_users"))
          .select(lit("1_signup").as("stage"), $"n_users")
          .unionAll(s2.agg(count(lit(1)).as("n_users"))
            .select(lit("2_view_within_2d").as("stage"), $"n_users"))
          .unionAll(s3.agg(count(lit(1)).as("n_users"))
            .select(lit("3_purchase_within_1d").as("stage"), $"n_users"))
          .orderBy($"stage")
      },
      Some("""WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'view' AND e.ts > t1
            AND e.ts <= t1 + INTERVAL 2 DAY
          GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > t2
            AND e.ts <= t2 + INTERVAL 1 DAY
          GROUP BY e.user_id)
        SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
        UNION ALL SELECT '2_view_within_2d', count(*) FROM s2
        UNION ALL SELECT '3_purchase_within_1d', count(*) FROM s3
        ORDER BY stage""")),

    // ---- cohort retention matrix: users grouped by first-activity day,
    // activity counted per (cohort, day-offset) cell for the first week.
    // Two user-keyed shuffles (first-day aggregate, distinct-user cell
    // aggregate); the join broadcasts the per-user cohort row. ----
    QueryDef(
      "an_events_retention",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val first = ev.groupBy($"user_id")
          .agg(min(to_date($"ts")).as("cohort_day"))
        ev.join(first, Seq("user_id"))
          .select($"user_id", $"cohort_day",
            datediff(to_date($"ts"), $"cohort_day").cast("long").as("day_offset"))
          .filter($"day_offset".between(0, 7))
          .groupBy($"cohort_day", $"day_offset")
          .agg(countDistinct($"user_id").as("n_active"))
          .orderBy($"cohort_day", $"day_offset")
      },
      Some("""WITH f AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
          FROM events GROUP BY user_id),
        d AS (
          SELECT e.user_id, f.cohort_day,
                 datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
          FROM events e JOIN f USING (user_id))
        SELECT cohort_day, day_offset, count(DISTINCT user_id) AS n_active
        FROM d WHERE day_offset BETWEEN 0 AND 7
        GROUP BY 1, 2 ORDER BY cohort_day, day_offset""")),

    // ---- top user-journey paths: each user-day's first 5 events in
    // (ts, event_id) order collapse to a '>'-joined path string, then the
    // corpus-wide path frequency table (the product-analytics "top flows"
    // report). Two keyed shuffles: the per-user-day window + collect, and
    // the path frequency aggregate; the ordered reassembly is
    // array_sort(collect_list(struct(rn, type))) — no global sort. ----
    QueryDef(
      "an_event_paths",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val w = Window.partitionBy($"user_id", to_date($"ts"))
          .orderBy($"ts", $"event_id")
        ev.withColumn("rn", row_number().over(w))
          .filter($"rn" <= 5)
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(concat_ws(">",
            transform(array_sort(collect_list(struct($"rn", $"event_type"))),
              x => x.getField("event_type"))).as("path"))
          .groupBy($"path")
          .agg(count(lit(1)).as("n_journeys"),
            countDistinct($"user_id").as("n_users"))
          .orderBy($"n_journeys".desc, $"path")
          .limit(20)
      },
      Some("""WITH r AS (
          SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts, event_id,
            row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
              ORDER BY ts, event_id) AS rn
          FROM events),
        p AS (
          SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 5 GROUP BY 1, 2)
        SELECT path, count(*) AS n_journeys, count(DISTINCT user_id) AS n_users
        FROM p GROUP BY path ORDER BY n_journeys DESC, path LIMIT 20""")),

    // ---- Boolean + min/max-by aggregates ----
    QueryDef(
      "an_agg_bool_minmaxby",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .groupBy($"c_mktsegment")
          .agg(
            bool_and($"c_acctbal" > -1000).as("all_above"),
            bool_or($"c_acctbal" > 9000).as("any_rich"),
            max_by($"c_custkey", struct($"c_acctbal", $"c_custkey")).as("richest_cust"),
            min_by($"c_custkey", struct($"c_acctbal", -$"c_custkey")).as("poorest_cust"))
          .orderBy($"c_mktsegment")
      },
      // max_by/min_by need a deterministic tiebreak: acctbal ties are broken
      // by custkey (highest key wins for max, highest key wins for min via
      // the negated second struct field); DuckDB mirrors with arg_max/arg_min
      // over the same composite.
      Some("""SELECT c_mktsegment,
        bool_and(c_acctbal > -1000) AS all_above,
        bool_or(c_acctbal > 9000) AS any_rich,
        first(c_custkey ORDER BY c_acctbal DESC, c_custkey DESC) AS richest_cust,
        first(c_custkey ORDER BY c_acctbal ASC, c_custkey DESC) AS poorest_cust
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- Bitwise aggregates (bit_and / bit_or / bit_xor): the flag-mask
    // rollup shape — one map-side-combinable hash aggregate, no extra
    // shuffle beyond the groupBy. ----
    QueryDef(
      "an_agg_bitwise",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("bit_and(l_orderkey)").as("mask_and"),
            expr("bit_or(l_orderkey)").as("mask_or"),
            expr("bit_xor(l_orderkey)").as("mask_xor"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
        bit_and(l_orderkey) AS mask_and,
        bit_or(l_orderkey) AS mask_or,
        bit_xor(l_orderkey) AS mask_xor,
        count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Exact median + deterministic modal value. median interpolates
    // identically on both engines (exact halves of doubles). The mode is
    // computed as "highest count, smallest value on ties" via a two-level
    // aggregate (count per value, then max_by over a composite key) because
    // both engines' native mode() leaves ties implementation-defined —
    // the same two-shuffle shape mode() itself costs distributed. ----
    QueryDef(
      "an_agg_median_mode",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val med = li.groupBy($"l_returnflag")
          .agg(round(median($"l_quantity"), 4).as("med_qty"),
            round(median($"l_extendedprice"), 4).as("med_price"))
        val modal = li.groupBy($"l_returnflag", $"l_quantity")
          .agg(count(lit(1)).as("cnt"))
          .groupBy($"l_returnflag")
          .agg(max_by($"l_quantity",
            $"cnt" * 1000 + (lit(999) - $"l_quantity")).as("modal_qty"))
        med.join(modal, "l_returnflag").orderBy($"l_returnflag")
      },
      Some("""WITH med AS (
          SELECT l_returnflag,
                 round(median(l_quantity), 4) AS med_qty,
                 round(median(l_extendedprice), 4) AS med_price
          FROM lineitem GROUP BY l_returnflag),
        cnts AS (
          SELECT l_returnflag, l_quantity, count(*) AS cnt
          FROM lineitem GROUP BY 1, 2),
        modal AS (
          SELECT l_returnflag,
                 arg_max(l_quantity, cnt * 1000 + (999 - l_quantity)) AS modal_qty
          FROM cnts GROUP BY l_returnflag)
        SELECT med.l_returnflag, med_qty, med_price, modal_qty
        FROM med JOIN modal USING (l_returnflag)
        ORDER BY l_returnflag""")),

    // ---- Linear-regression aggregate family (regr_*): slope/intercept/R²
    // of extendedprice vs quantity per flag — one hash aggregate, the
    // moment sums combine map-side like any algebraic aggregate. ----
    QueryDef(
      "an_regression",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
            round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
            round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
            expr("regr_count(l_extendedprice, l_quantity)").as("n"),
            round(expr("regr_avgx(l_extendedprice, l_quantity)"), 4).as("avg_x"),
            round(expr("regr_avgy(l_extendedprice, l_quantity)"), 4).as("avg_y"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
        round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
        round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Ordered string aggregation (LISTAGG WITHIN GROUP — the SQL:2016
    // form Spark 4 executes natively; DuckDB's string_agg ORDER BY is the
    // same operation). Small-group shape: one shuffle on the group key. ----
    QueryDef(
      "an_listagg",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("an_la_nation")
        s.sql("""SELECT n_regionkey,
            listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
            count(*) AS n
          FROM an_la_nation
          GROUP BY n_regionkey ORDER BY n_regionkey""")
      },
      Some("""SELECT n_regionkey,
        string_agg(n_name, ',' ORDER BY n_name) AS nations,
        count(*) AS n
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- First/last-touch attribution: for each user who purchased, the
    // first and the last event seen STRICTLY before their first purchase,
    // then the (first_touch, last_touch) channel matrix. Composite scalar
    // key epoch_ms·10⁶+event_id keeps arg-min/max deterministic on both
    // engines without struct comparison. Two aggregates + one broadcast-able
    // join (purchasers ≪ events at scale). ----
    QueryDef(
      "an_attribution",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val firstPurchase = ev.filter($"event_type" === "purchase")
          .groupBy($"user_id").agg(min($"ts").as("fp_ts"))
        val key = unix_millis($"ts") * 1000000L + $"event_id"
        val touches = ev.join(firstPurchase, "user_id")
          .filter($"ts" < $"fp_ts")
          .groupBy($"user_id")
          .agg(min_by($"event_type", key).as("first_touch"),
            max_by($"event_type", key).as("last_touch"))
        touches.groupBy($"first_touch", $"last_touch")
          .agg(count(lit(1)).as("n_users"))
          .orderBy($"first_touch", $"last_touch")
      },
      Some("""WITH fp AS (
          SELECT user_id, min(ts) AS fp_ts
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        touches AS (
          SELECT e.user_id,
            arg_min(e.event_type, epoch_ms(e.ts) * 1000000 + e.event_id)
              AS first_touch,
            arg_max(e.event_type, epoch_ms(e.ts) * 1000000 + e.event_id)
              AS last_touch
          FROM events e JOIN fp USING (user_id)
          WHERE e.ts < fp.fp_ts GROUP BY e.user_id)
        SELECT first_touch, last_touch, count(*) AS n_users
        FROM touches GROUP BY 1, 2 ORDER BY first_touch, last_touch""")),

    // ---- SCD Type-2 dimension build: the warehouse history table every
    // nightly ingest maintains. Collapse each user's event stream to its
    // state CHANGES (lag filter), then version each change with
    // valid_from/valid_to interval columns (lead) and an is_current flag.
    // Two windows over the SAME (user_id → ts, event_id) partitioning —
    // Catalyst plans one Exchange + one sort reused by both Window nodes,
    // so at 100 TB this is a single shuffle keyed by the dimension's
    // natural key, no matter how many versions a hot user has. ----
    QueryDef(
      "an_scd2_history",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val changes = t(s, dir, "events")
          .withColumn("prev", lag($"event_type", 1).over(w))
          .filter($"prev".isNull || $"prev" =!= $"event_type")
        changes
          .withColumn("version", row_number().over(w))
          .withColumn("valid_to", lead($"ts", 1).over(w))
          .select($"user_id", $"version", $"event_type".as("state"),
            $"ts".as("valid_from"), $"valid_to",
            $"valid_to".isNull.as("is_current"))
          .orderBy($"user_id", $"version")
      },
      Some("""WITH ch AS (
          SELECT user_id, ts, event_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev
          FROM events),
        chg AS (SELECT * FROM ch WHERE prev IS NULL OR prev <> event_type)
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS version,
               event_type AS state, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS valid_to,
               (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL) AS is_current
        FROM chg ORDER BY user_id, version""")),

    // ---- time-series gap fill + forward fill: the resampling primitive
    // (sensor/metrics regularization before training). Per-user daily
    // totals; the calendar spine is generated per user from its own
    // [min_day, max_day] (sequence+explode — no driver round-trip, no
    // global calendar broadcast), missing days left-joined in, values
    // forward-filled with last(ignoreNulls) over the user's day order.
    // One groupBy shuffle + one window over the same user partitioning;
    // the spine join is user-keyed (never a cross join). Restricted to
    // user_id < 50 to keep the dumped series small — the plan shape is
    // SF-independent. ----
    QueryDef(
      "an_timeseries_gapfill",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .filter($"user_id" < 50)
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(count(lit(1)).as("n_events"), sum(m($"value")).as("v"))
        val spine = daily.groupBy($"user_id")
          .agg(min($"day").as("d0"), max($"day").as("d1"))
          .select($"user_id",
            explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        spine.join(daily, Seq("user_id", "day"), "left")
          .select($"user_id", $"day",
            coalesce($"n_events", lit(0L)).as("n_events"),
            $"v".isNull.as("is_gap"),
            last($"v", ignoreNulls = true).over(w)
              .cast("double").as("v_ffill"))
          .orderBy($"user_id", $"day")
      },
      Some("""WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 count(*) AS n_events,
                 sum(CAST(value AS DECIMAL(12,2))) AS v
          FROM events WHERE user_id < 50 GROUP BY 1, 2),
        spine AS (
          SELECT user_id,
                 CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
                   CAST(max(day) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
                   AS day
          FROM daily GROUP BY user_id)
        SELECT s.user_id, s.day,
               COALESCE(d.n_events, 0) AS n_events,
               (d.v IS NULL) AS is_gap,
               CAST(last_value(d.v IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day) AS DOUBLE)
                 AS v_ffill
        FROM spine s LEFT JOIN daily d
          ON s.user_id = d.user_id AND s.day = d.day
        ORDER BY s.user_id, s.day""")),

    // ---- rolling z-score anomaly detection: daily per-type totals scored
    // against their own trailing-7-day window (current day EXCLUDED — no
    // self-contamination). Cross-engine determinism: the windowed sums are
    // over DECIMALS (exact, associative — DuckDB's segment-tree frame
    // evaluation and Spark's running frame can add in any order), cast to
    // double only for the final scalar mean/variance/z arithmetic, which is
    // identical IEEE on both engines; z rounded. One groupBy + one window
    // exchange on the same key. ----
    QueryDef(
      "an_anomaly_zscore",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(sum(m($"value")).as("v"))
          .withColumn("v2", ($"v" * $"v").cast(DecimalType(28, 4)))
        val w = Window.partitionBy($"event_type").orderBy($"day")
          .rowsBetween(-7, -1)
        daily
          .select($"event_type", $"day", $"v",
            sum($"v").over(w).cast("double").as("sv"),
            sum($"v2").over(w).cast("double").as("sv2"),
            count($"v").over(w).as("n_win"))
          // ANSI front door: divisions stay behind n_win guards (a 0- or
          // 1-row frame would otherwise divide by zero)
          .withColumn("mu", when($"n_win" >= 1, $"sv" / $"n_win"))
          .withColumn("sd", when($"n_win" >= 3, sqrt(
            ($"sv2" - $"sv" * $"sv" / $"n_win") / ($"n_win" - 1))))
          .withColumn("z",
            when($"sd" > 0,
              round(($"v".cast("double") - $"mu") / $"sd", 3)))
          .select($"event_type", $"day", $"v".cast("double").as("v"),
            $"n_win", round($"mu", 3).as("mu_trailing"), $"z",
            ($"z".isNotNull && abs($"z") > 2.0).as("is_anomaly"))
          .orderBy($"event_type", $"day")
      },
      Some("""WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(CAST(value AS DECIMAL(12,2))) AS v
          FROM events GROUP BY 1, 2),
        d2 AS (SELECT *, CAST(v * v AS DECIMAL(28,4)) AS v2 FROM daily),
        win AS (
          SELECT event_type, day, v,
            CAST(sum(v) OVER w AS DOUBLE) AS sv,
            CAST(sum(v2) OVER w AS DOUBLE) AS sv2,
            count(v) OVER w AS n_win
          FROM d2
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        sc AS (
          SELECT *,
            CASE WHEN n_win >= 1 THEN sv / n_win END AS mu,
            CASE WHEN n_win >= 3
                 THEN sqrt((sv2 - sv * sv / n_win) / (n_win - 1)) END AS sd
          FROM win),
        z AS (
          SELECT *,
            CASE WHEN sd > 0
                 THEN round((CAST(v AS DOUBLE) - mu) / sd, 3) END AS z
          FROM sc)
        SELECT event_type, day, CAST(v AS DOUBLE) AS v, n_win,
               round(mu, 3) AS mu_trailing, z,
               (z IS NOT NULL AND abs(z) > 2.0) AS is_anomaly
        FROM z ORDER BY event_type, day""")),

    // ---- window navigation battery with IGNORE NULLS: lag/lead/first/
    // nth_value over a sparse (nullable) series — the sensor-carry-forward
    // vocabulary beyond plain lag. Nulls are injected deterministically
    // (value ≤ 50 → NULL); one window exchange, unique (ts, event_id)
    // order. ----
    QueryDef(
      "an_window_navigation",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        t(s, dir, "events")
          .filter($"user_id" < 30)
          .select($"user_id", $"event_id", $"ts",
            when($"value" > 50, m($"value")).as("v"))
          .select($"user_id", $"event_id",
            lag($"v", 1).over(w).cast("double").as("lag_plain"),
            lag($"v", 1, null, ignoreNulls = true).over(w)
              .cast("double").as("lag_skip"),
            lead($"v", 1, null, ignoreNulls = true).over(w)
              .cast("double").as("lead_skip"),
            first($"v", ignoreNulls = true).over(w)
              .cast("double").as("first_nn"),
            nth_value($"v", 2, ignoreNulls = true).over(w)
              .cast("double").as("second_nn"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, ts,
            CASE WHEN value > 50 THEN CAST(value AS DECIMAL(12,2)) END AS v
          FROM events WHERE user_id < 30)
        SELECT user_id, event_id,
          CAST(lag(v, 1) OVER w AS DOUBLE) AS lag_plain,
          CAST(lag(v, 1 IGNORE NULLS) OVER w AS DOUBLE) AS lag_skip,
          CAST(lead(v, 1 IGNORE NULLS) OVER w AS DOUBLE) AS lead_skip,
          CAST(first_value(v IGNORE NULLS) OVER w AS DOUBLE) AS first_nn,
          CAST(nth_value(v, 2 IGNORE NULLS) OVER w AS DOUBLE) AS second_nn
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id""")),

    // ---- market-basket association mining (brand co-occurrence lift over
    // orders): distinct brands per order, pairwise self-join WITHIN each
    // order (basket fanout is bounded by order size, never corpus²),
    // support/confidence/lift from the pair counts with singleton counts
    // broadcast back. Lift rounds BEFORE ranking so the top-15 reproduces
    // across engines; top-15 plans as TakeOrdered, not a global sort. ----
    QueryDef(
      "an_market_basket",
      (s, dir) => {
        import s.implicits._
        val items = Tables.load(s, dir, "lineitem")
          .join(broadcast(Tables.load(s, dir, "part")),
            $"l_partkey" === $"p_partkey")
          .select($"l_orderkey".as("okey"), $"p_brand".as("brand"))
          .distinct()
        val nOrders = Tables.load(s, dir, "orders")
          .agg(countDistinct($"o_orderkey").as("n_orders"))
        val singles = items.groupBy($"brand").agg(count(lit(1)).as("c1"))
        val a = items.select($"okey", $"brand".as("brand_a"))
        val b = items.select($"okey", $"brand".as("brand_b"))
        val pairs = a.join(b, Seq("okey")).filter($"brand_a" < $"brand_b")
          .groupBy($"brand_a", $"brand_b").agg(count(lit(1)).as("c_ab"))
        pairs
          .join(broadcast(singles.select($"brand".as("brand_a"), $"c1".as("c_a"))),
            Seq("brand_a"))
          .join(broadcast(singles.select($"brand".as("brand_b"), $"c1".as("c_b"))),
            Seq("brand_b"))
          .crossJoin(broadcast(nOrders))
          .select($"brand_a", $"brand_b", $"c_ab",
            round($"c_ab" / $"n_orders".cast("double"), 6).as("support"),
            round($"c_ab" / $"c_a".cast("double"), 6).as("confidence"),
            // lift multiplies in DOUBLE: long×long c_ab·n_orders (and
            // c_a·c_b) silently wraps past 2^63 at corpus scale
            round($"c_ab".cast("double") * $"n_orders" /
              ($"c_a".cast("double") * $"c_b"), 6).as("lift"))
          .orderBy($"lift".desc, $"brand_a", $"brand_b")
          .limit(15)
      },
      Some("""WITH items AS (
          SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        n AS (SELECT count(DISTINCT o_orderkey) AS n_orders FROM orders),
        singles AS (SELECT brand, count(*) AS c1 FROM items GROUP BY 1),
        pairs AS (
          SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS c_ab
          FROM items a JOIN items b
            ON a.okey = b.okey AND a.brand < b.brand
          GROUP BY 1, 2)
        SELECT brand_a, brand_b, c_ab,
          round(c_ab / CAST(n_orders AS DOUBLE), 6) AS support,
          round(c_ab / CAST(sa.c1 AS DOUBLE), 6) AS confidence,
          round(CAST(c_ab AS DOUBLE) * n_orders / (CAST(sa.c1 AS DOUBLE) * sb.c1), 6) AS lift
        FROM pairs
        JOIN singles sa ON sa.brand = pairs.brand_a
        JOIN singles sb ON sb.brand = pairs.brand_b
        CROSS JOIN n
        ORDER BY lift DESC, brand_a, brand_b LIMIT 15""")),

    // ---- abandoned-cart detection: clicks with NO purchase by the same
    // user within the following hour — an anti-join whose equi key is the
    // user and whose time window is a residual predicate (never a
    // cartesian); daily counts of clicks vs abandoned with the rate. The
    // per-day report is what a conversion dashboard polls. ----
    QueryDef(
      "an_abandoned_carts",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"ts".as("p_ts"))
        val abandoned = clicks.join(purchases,
          $"user_id" === $"p_user" &&
            $"p_ts" > $"ts" && $"p_ts" <= $"ts" + expr("INTERVAL 1 HOUR"),
          "left_anti")
        val byDayAll = clicks.groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("n_clicks"))
        val byDayAb = abandoned.groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("n_abandoned"))
        byDayAll.join(byDayAb, Seq("day"), "left_outer")
          .select($"day", $"n_clicks",
            coalesce($"n_abandoned", lit(0L)).as("n_abandoned"),
            round(coalesce($"n_abandoned", lit(0L)) / $"n_clicks".cast("double"), 6)
              .as("abandon_rate"))
          .orderBy($"day")
      },
      Some("""WITH clicks AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE event_type = 'click'),
        purchases AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE event_type = 'purchase'),
        ab AS (
          SELECT c.* FROM clicks c
          WHERE NOT EXISTS (SELECT 1 FROM purchases p
            WHERE p.user_id = c.user_id
              AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)),
        d_all AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks
          FROM clicks GROUP BY 1),
        d_ab AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS n_abandoned
          FROM ab GROUP BY 1)
        SELECT d_all.day, n_clicks,
          coalesce(n_abandoned, 0) AS n_abandoned,
          round(coalesce(n_abandoned, 0) / CAST(n_clicks AS DOUBLE), 6)
            AS abandon_rate
        FROM d_all LEFT JOIN d_ab ON d_all.day = d_ab.day
        ORDER BY d_all.day""")),

    // ---- customer-value deciles: per-user purchase totals (EXACT decimal
    // sums — order-independent, so the hash compare holds) cut into rank
    // deciles. User grain is UNBOUNDED (hundreds of millions of rows at
    // 100×), so the rank comes from the distributed range-bucket
    // `LayoutOps.globalRowNumber` — never an unpartitioned ntile window —
    // and decile = ceil(10·rank/n), a deterministic pure function of
    // (rank, n) both engines compute identically. ----
    QueryDef(
      "an_user_value_deciles",
      (s, dir) => {
        import s.implicits._
        val ltv = Tables.load(s, dir, "events")
          .filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(sum($"value".cast(DecimalType(12, 2))).as("ltv"),
            count(lit(1)).as("n_purchases"))
        val n = ltv.agg(count(lit(1)).as("n_total"))
        LayoutOps.globalRowNumber(ltv, -$"ltv".cast("double"),
            Seq($"ltv".desc, $"user_id"), buckets = 32, outCol = "rn")
          .crossJoin(broadcast(n))
          .withColumn("decile",
            ceil(lit(10.0) * $"rn" / $"n_total").cast("int"))
          .groupBy($"decile")
          .agg(count(lit(1)).as("n_users"),
            sum($"n_purchases").as("n_purchases"),
            sum($"ltv").as("total"))
          .select($"decile", $"n_users", $"n_purchases",
            round($"total".cast("double"), 2).as("total_value"),
            round($"total".cast("double") / $"n_users", 4).as("avg_value"))
          .orderBy($"decile")
      },
      Some("""WITH ltv AS (
          SELECT user_id, sum(CAST(value AS DECIMAL(12,2))) AS ltv,
                 count(*) AS n_purchases
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        d AS (
          SELECT *,
            CAST(ceil(10.0 * row_number() OVER (ORDER BY ltv DESC, user_id)
              / count(*) OVER ()) AS INT) AS decile
          FROM ltv),
        g AS (
          SELECT decile, count(*) AS n_users,
            CAST(sum(n_purchases) AS BIGINT) AS n_purchases,
            sum(ltv) AS total
          FROM d GROUP BY decile)
        SELECT decile, n_users, n_purchases,
          round(CAST(total AS DOUBLE), 2) AS total_value,
          round(CAST(total AS DOUBLE) / n_users, 4) AS avg_value
        FROM g ORDER BY decile""")),

    // ---- RFM segmentation (recency / frequency / monetary): per-user
    // last-purchase age, purchase count, and exact-decimal spend, each cut
    // into rank terciles (1 = best); users land in 27 "r-f-m" cells. User
    // grain is unbounded, so each of the three ranks is a distributed
    // `globalRowNumber` (range-bucketed, no single-task window) and
    // tercile = ceil(3·rank/n) — deterministic in (rank, n) on any engine.
    // Monetary sums stay DECIMAL so tercile boundaries are
    // order-independent. ----
    QueryDef(
      "an_rfm_segments",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
          .filter($"event_type" === "purchase")
        val maxTs = ev.agg(max($"ts").as("max_ts"))
        val users = ev.groupBy($"user_id")
          .agg(max($"ts").as("last_ts"),
            count(lit(1)).as("freq"),
            sum($"value".cast(DecimalType(12, 2))).as("monetary"))
          .crossJoin(broadcast(maxTs))
          .withColumn("recency_days",
            datediff(to_date($"max_ts"), to_date($"last_ts")))
        // Each globalRowNumber stage references its input ~3x (boundary
        // aggregate, bucketed main pass, per-bucket counts); chaining three
        // would recompute the purchase aggregate ~27x without the lineage
        // cuts (lazy, per the cascade convention - nothing executes at
        // construction time).
        val usersCp = users.localCheckpoint(false)
        val n = usersCp.agg(count(lit(1)).as("n_total"))
        val rk1 = LayoutOps.globalRowNumber(usersCp,
          $"recency_days".cast("double"),
          Seq($"recency_days", $"user_id"), buckets = 32, outCol = "rn_r")
          .localCheckpoint(false)
        val rk2 = LayoutOps.globalRowNumber(rk1, -$"freq".cast("double"),
          Seq($"freq".desc, $"user_id"), buckets = 32, outCol = "rn_f")
          .localCheckpoint(false)
        val rk3 = LayoutOps.globalRowNumber(rk2, -$"monetary".cast("double"),
          Seq($"monetary".desc, $"user_id"), buckets = 32, outCol = "rn_m")
        def tercile(rn: Column): Column =
          ceil(lit(3.0) * rn / $"n_total").cast("int")
        val seg = rk3.crossJoin(broadcast(n))
          .withColumn("r", tercile($"rn_r"))
          .withColumn("f", tercile($"rn_f"))
          .withColumn("m", tercile($"rn_m"))
        seg.groupBy(concat($"r", lit("-"), $"f", lit("-"), $"m").as("segment"))
          .agg(count(lit(1)).as("n_users"),
            round(avg($"recency_days"), 4).as("avg_recency_days"),
            round(avg($"freq"), 4).as("avg_freq"),
            round(sum($"monetary").cast("double"), 2).as("total_value"))
          .orderBy($"segment")
      },
      Some("""WITH ev AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
          WHERE event_type = 'purchase'),
        mx AS (SELECT max(ts) AS max_ts FROM ev),
        users AS (
          SELECT user_id, max(ts) AS last_ts, count(*) AS freq,
                 sum(CAST(value AS DECIMAL(12,2))) AS monetary
          FROM ev GROUP BY user_id),
        u2 AS (
          SELECT user_id, freq, monetary,
            date_diff('day', CAST(last_ts AS DATE), CAST(max_ts AS DATE))
              AS recency_days
          FROM users CROSS JOIN mx),
        seg AS (
          SELECT *,
            CAST(ceil(3.0 * row_number() OVER (ORDER BY recency_days, user_id)
              / count(*) OVER ()) AS INT) AS r,
            CAST(ceil(3.0 * row_number() OVER (ORDER BY freq DESC, user_id)
              / count(*) OVER ()) AS INT) AS f,
            CAST(ceil(3.0 * row_number() OVER (ORDER BY monetary DESC, user_id)
              / count(*) OVER ()) AS INT) AS m
          FROM u2)
        SELECT r || '-' || f || '-' || m AS segment,
          count(*) AS n_users,
          round(avg(recency_days), 4) AS avg_recency_days,
          round(avg(freq), 4) AS avg_freq,
          round(CAST(sum(monetary) AS DOUBLE), 2) AS total_value
        FROM seg GROUP BY 1 ORDER BY segment""")),

    // ---- two-sample Kolmogorov-Smirnov statistic (distribution-drift
    // test with an actual test statistic, complementing the JSD monitor):
    // D = max |F_en(x) − F_other(x)| over doc-length empirical CDFs.
    // One aggregate to per-value counts, one cumsum window over the
    // DISTINCT-value table (bounded by distinct lengths, not corpus
    // rows), one max. Reports D and the location where it's attained
    // (min x at the max, deterministic). ----
    QueryDef(
      "an_ks_test_lengths",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val pts = docs.select($"n_chars".as("x"),
          ($"lang" === "en").as("is_en"))
        val tot = pts.agg(
          sum(when($"is_en", 1L).otherwise(0L)).as("n_en"),
          sum(when(!$"is_en", 1L).otherwise(0L)).as("n_other"))
        val w = Window.orderBy($"x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cdf = pts.groupBy($"x").agg(
            sum(when($"is_en", 1L).otherwise(0L)).as("a"),
            sum(when(!$"is_en", 1L).otherwise(0L)).as("b"))
          .withColumn("cum_a", sum($"a").over(w))
          .withColumn("cum_b", sum($"b").over(w))
          .crossJoin(broadcast(tot))
          .withColumn("diff",
            abs($"cum_a" / $"n_en".cast("double") -
              $"cum_b" / $"n_other".cast("double")))
        val dMax = cdf.agg(max($"diff").as("d"))
        cdf.crossJoin(broadcast(dMax))
          .filter($"diff" === $"d")
          .groupBy($"n_en", $"n_other", $"d")
          .agg(min($"x").as("at_x"))
          .select($"n_en", $"n_other", round($"d", 6).as("ks_d"), $"at_x")
      },
      Some("""WITH pts AS (
          SELECT n_chars AS x, lang = 'en' AS is_en FROM documents),
        tot AS (
          SELECT sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS n_en,
                 sum(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS n_other
          FROM pts),
        g AS (
          SELECT x,
            sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS a,
            sum(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS b
          FROM pts GROUP BY x),
        cdf AS (
          SELECT x,
            sum(a) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_a,
            sum(b) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_b
          FROM g),
        d AS (
          SELECT x,
            abs(cum_a / CAST(n_en AS DOUBLE) - cum_b / CAST(n_other AS DOUBLE))
              AS diff, n_en, n_other
          FROM cdf CROSS JOIN tot),
        mx AS (SELECT max(diff) AS dm FROM d)
        SELECT CAST(n_en AS BIGINT) AS n_en, CAST(n_other AS BIGINT) AS n_other,
          round(dm, 6) AS ks_d, min(x) AS at_x
        FROM d CROSS JOIN mx WHERE diff = dm
        GROUP BY 1, 2, 3""")),

    // ---- seasonal-naive forecast evaluation: predict each day's
    // per-type revenue with the value 7 days earlier, report WAPE =
    // Σ|err| / Σ actual from EXACT decimal sums (order-independent —
    // never an avg over per-row doubles). The baseline every real
    // forecasting model must beat, and the eval harness shape for it. ----
    QueryDef(
      "an_forecast_seasonal_naive",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.load(s, dir, "events")
          .filter($"event_type" === "purchase" || $"event_type" === "click")
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(sum($"value".cast(DecimalType(12, 2))).as("v"))
        val lagged = daily.select($"event_type",
          date_add($"day", 7).as("day"), $"v".as("v_pred"))
        daily.join(lagged, Seq("event_type", "day"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(abs($"v" - $"v_pred")).as("sae"),
            sum($"v").as("sv"))
          .select($"event_type", $"n_days",
            round($"sae".cast("double"), 2).as("sum_abs_err"),
            round(($"sae" / $"sv").cast("double"), 6).as("wape"))
          .orderBy($"event_type")
      },
      Some("""WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(CAST(value AS DECIMAL(12,2))) AS v
          FROM events
          WHERE event_type IN ('purchase', 'click')
          GROUP BY 1, 2),
        lagged AS (
          SELECT event_type, day + 7 AS day, v AS v_pred
          FROM daily),
        j AS (
          SELECT d.event_type, d.v, l.v_pred
          FROM daily d JOIN lagged l
            ON d.event_type = l.event_type AND d.day = l.day)
        SELECT event_type, count(*) AS n_days,
          round(CAST(sum(abs(v - v_pred)) AS DOUBLE), 2) AS sum_abs_err,
          round(CAST(sum(abs(v - v_pred)) / sum(v) AS DOUBLE), 6) AS wape
        FROM j GROUP BY event_type ORDER BY event_type""")),

    // ---- Gini coefficient of revenue concentration: G = 2·Σ(i·xᵢ)/(n·Σxᵢ)
    // − (n+1)/n over per-user purchase totals sorted ascending — the
    // single-number inequality read behind "top 10% of users drive X%".
    // Both Σ terms stay EXACT decimal (i·xᵢ is decimal × int) so the rank
    // weighting is order-independent; only the final ratio is double. The
    // rank is the distributed `globalRowNumber` (user grain is unbounded —
    // an unpartitioned window would funnel every user through one task). ----
    QueryDef(
      "an_gini_revenue",
      (s, dir) => {
        import s.implicits._
        val ltv = Tables.load(s, dir, "events")
          .filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(sum($"value".cast(DecimalType(12, 2))).as("x"))
        LayoutOps.globalRowNumber(ltv, $"x".cast("double"),
            Seq($"x", $"user_id"), buckets = 32, outCol = "i")
          .agg(count(lit(1)).as("n"),
            sum($"x").as("sx"),
            sum($"x" * $"i").as("swx"))
          .select($"n".as("n_users"),
            round($"sx".cast("double"), 2).as("total_value"),
            round(
              lit(2.0) * $"swx".cast("double") /
                ($"n" * $"sx".cast("double")) -
                ($"n" + 1).cast("double") / $"n", 6).as("gini"))
      },
      Some("""WITH ltv AS (
          SELECT user_id, sum(CAST(value AS DECIMAL(12,2))) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        r AS (
          SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM ltv),
        a AS (
          SELECT count(*) AS n, sum(x) AS sx, sum(x * i) AS swx FROM r)
        SELECT n AS n_users,
          round(CAST(sx AS DOUBLE), 2) AS total_value,
          round(2.0 * CAST(swx AS DOUBLE) / (n * CAST(sx AS DOUBLE))
            - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
        FROM a""")),

    // ---- longest activity streak per user (gaps-and-islands): the
    // engagement metric behind every retention dashboard. The classic
    // anchor trick — day minus per-user row_number is CONSTANT within a
    // consecutive run — turns streak detection into a plain groupBy; both
    // windows partition BY USER (bounded by a user's distinct days), and
    // the distinct-day table is the only thing that ever shuffles. ----
    QueryDef(
      "an_user_streaks",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val days = Tables.load(s, dir, "events")
          .select($"user_id", to_date($"ts").as("day")).distinct()
        days
          .withColumn("anchor",
            date_sub($"day", row_number().over(w)))
          .groupBy($"user_id", $"anchor")
          .agg(count(lit(1)).cast("int").as("streak_len"),
            min($"day").as("streak_start"), max($"day").as("streak_end"))
          .withColumn("rk", row_number().over(
            Window.partitionBy($"user_id")
              .orderBy($"streak_len".desc, $"streak_start")))
          .filter($"rk" === 1)
          .select($"user_id", $"streak_len", $"streak_start", $"streak_end")
          .orderBy($"user_id")
      },
      Some("""WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        anchored AS (
          SELECT user_id, day,
            day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                  AS INTEGER) AS anchor
          FROM days),
        streaks AS (
          SELECT user_id, CAST(count(*) AS INT) AS streak_len,
            min(day) AS streak_start, max(day) AS streak_end
          FROM anchored GROUP BY user_id, anchor)
        SELECT user_id, streak_len, streak_start, streak_end FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY streak_len DESC, streak_start) AS rk
          FROM streaks)
        WHERE rk = 1 ORDER BY user_id""")),

    // ---- Rolling 7-day distinct users (daily active reach). COUNT(DISTINCT)
    // over a sliding window has no distributed windowed form — collecting
    // per-day user SETS into a window frame would move every user id through
    // one task per day. The scalable exact formulation inverts it: each
    // (user, active-day) pair contributes to the 7 window-ending days it
    // covers, so an explode(sequence(day, day+6)) + one countDistinct groupBy
    // IS the rolling distinct — shuffle is 7× the daily-distinct pairs,
    // partitioned by day, no single-task funnel. The semi-join restricts
    // output to days that actually occur (day grain is bounded → broadcast).
    QueryDef(
      "an_rolling_distinct_users",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .select(to_date($"ts").as("day"), $"user_id").distinct()
        val actual = daily.select($"day").distinct()
        daily
          .select(explode(expr("sequence(day, date_add(day, 6))")).as("wday"),
            $"user_id")
          .join(broadcast(actual), $"wday" === actual("day"), "left_semi")
          .groupBy($"wday")
          .agg(countDistinct($"user_id").as("u7"))
          .select($"wday".as("day"), $"u7")
          .orderBy($"day")
      },
      Some("""WITH daily AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        days AS (SELECT DISTINCT day FROM daily)
        SELECT d.day,
          (SELECT count(DISTINCT da.user_id) FROM daily da
            WHERE da.day BETWEEN d.day - INTERVAL 6 DAY AND d.day) AS u7
        FROM days d ORDER BY d.day""")),

    // ---- Stickiness (DAU/MAU₍₂₈₎): the second consumer of the rolling-
    // distinct day-expansion — DAU is a plain per-day countDistinct, the
    // 28-day MAU explodes each (user, day) pair into its covered window
    // days (28× day-grain pairs, shuffled on day), and the day-grain join
    // that combines them is bounded by the calendar. No per-day user sets
    // ever collect anywhere. ----
    QueryDef(
      "an_stickiness_dau_mau",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .select(to_date($"ts").as("day"), $"user_id").distinct()
        val dau = daily.groupBy($"day").agg(count(lit(1)).as("dau"))
        val mau = daily
          .select(explode(expr("sequence(day, date_add(day, 27))")).as("wday"),
            $"user_id")
          .groupBy($"wday")
          .agg(countDistinct($"user_id").as("mau28"))
        dau.join(mau, $"day" === $"wday")
          .select($"day", $"dau", $"mau28",
            round($"dau" / $"mau28".cast("double"), 6).as("stickiness"))
          .orderBy($"day")
      },
      Some("""WITH daily AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        d AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM daily GROUP BY day)
        SELECT d.day, d.dau,
          (SELECT count(DISTINCT da.user_id) FROM daily da
            WHERE da.day BETWEEN d.day - INTERVAL 27 DAY AND d.day) AS mau28,
          round(d.dau * 1.0 / (SELECT count(DISTINCT da.user_id) FROM daily da
            WHERE da.day BETWEEN d.day - INTERVAL 27 DAY AND d.day), 6)
            AS stickiness
        FROM d ORDER BY d.day""")),

    // ---- Two-proportion z-test (experiment readout): unit = user-day,
    // conversion = the day contains a purchase, variant = deterministic
    // user split. The whole test is two combinable aggregates — per-unit
    // conversion flags, then per-variant totals — and the z statistic is
    // scalar arithmetic on four integers, so the 100 TB cost is one
    // groupBy over (user, day) and the result is exact (no sampling, no
    // t-approximation needed at these n). |z| > 1.96 ⇒ significant at
    // α = 0.05 two-sided. ----
    QueryDef(
      "an_ab_test_proportions",
      (s, dir) => {
        import s.implicits._
        val ud = t(s, dir, "events")
          .groupBy($"user_id", to_date($"ts").as("day"),
            ($"user_id" % 2).as("variant"))
          .agg(max(when($"event_type" === "purchase", 1).otherwise(0))
            .as("converted"))
        val v = ud.groupBy($"variant")
          .agg(count(lit(1)).as("n_units"),
            sum($"converted").cast("long").as("n_conv"))
        val w = v.agg(
          max(when($"variant" === 0, $"n_units")).as("n_a"),
          max(when($"variant" === 0, $"n_conv")).as("conv_a"),
          max(when($"variant" === 1, $"n_units")).as("n_b"),
          max(when($"variant" === 1, $"n_conv")).as("conv_b"))
        val p = ($"conv_a" + $"conv_b").cast("double") / ($"n_a" + $"n_b")
        val z = ($"conv_a" / $"n_a".cast("double") -
          $"conv_b" / $"n_b".cast("double")) /
          sqrt(p * (lit(1.0) - p) * (lit(1.0) / $"n_a" + lit(1.0) / $"n_b"))
        w.select($"n_a", $"conv_a", $"n_b", $"conv_b",
          round($"conv_a" / $"n_a".cast("double"), 6).as("rate_a"),
          round($"conv_b" / $"n_b".cast("double"), 6).as("rate_b"),
          round(z, 6).as("z_stat"),
          when(abs(z) > 1.959964, 1).otherwise(0).as("significant"))
      },
      Some("""WITH ud AS (
          SELECT user_id, CAST(ts AS DATE) AS day, user_id % 2 AS variant,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
          FROM events GROUP BY 1, 2, 3),
        v AS (
          SELECT variant, CAST(count(*) AS BIGINT) AS n_units,
            CAST(sum(converted) AS BIGINT) AS n_conv
          FROM ud GROUP BY variant),
        w AS (
          SELECT
            max(CASE WHEN variant = 0 THEN n_units END) AS n_a,
            max(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
            max(CASE WHEN variant = 1 THEN n_units END) AS n_b,
            max(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
          FROM v)
        SELECT n_a, conv_a, n_b, conv_b,
          round(conv_a * 1.0 / n_a, 6) AS rate_a,
          round(conv_b * 1.0 / n_b, 6) AS rate_b,
          round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
            / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                 * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat,
          CASE WHEN abs((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
            / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                 * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b))) > 1.959964 THEN 1 ELSE 0 END
            AS significant
        FROM w""")),

    // ---- CUPED variance reduction (Deng et al. 2013): adjust each user's
    // post-period purchase value by their pre-period value, θ = cov/var of
    // the two. One groupBy builds the per-user (pre, post) pair with
    // EXACT decimal sums (the repo's money convention), θ and the pre-mean
    // are a single 1-row aggregate broadcast back, and the readout is one
    // more per-variant aggregate — three combinable passes, nothing
    // driver-side. var_reduction is the fraction of metric variance the
    // covariate removes (what the experiment's required sample size
    // shrinks by). ----
    QueryDef(
      "an_ab_cuped",
      (s, dir) => {
        import s.implicits._
        // DETERMINISM: every reported number derives from EXACT decimal
        // sufficient statistics (Σx, Σy, Σxy, Σx², Σy² per variant and
        // globally) with ONE double cast each — θ, means, variances and
        // the CUPED identities Var(y−θ(x−m̄)) = Vy − 2θC + θ²Vx and
        // mean(cuped) = ȳ − θ(x̄ − m̄) then compute the IDENTICAL doubles
        // in both engines. avg()/var_pop() over doubles is summation-
        // order-dependent and flipped a round(,4) half-boundary at tiny
        // SF (the sf0.001 probe caught it).
        val ev = t(s, dir, "events")
        val bounds = ev.agg(min(to_date($"ts")).as("d0"))
        val cut = date_add($"d0", 14)
        val zero = lit(0).cast(money)
        val pd = org.apache.spark.sql.types.DecimalType(15, 2)
        val u = ev.crossJoin(broadcast(bounds))
          .groupBy($"user_id", ($"user_id" % 2).as("variant"))
          .agg(
            sum(when(to_date($"ts") < cut && $"event_type" === "purchase",
              m($"value")).otherwise(zero)).cast(pd).as("pre_d"),
            sum(when(to_date($"ts") >= cut && $"event_type" === "purchase",
              m($"value")).otherwise(zero)).cast(pd).as("post_d"))
        val th = u.agg(
            count(lit(1)).cast("double").as("n"),
            sum($"pre_d").cast("double").as("sx"),
            sum($"post_d").cast("double").as("sy"),
            sum($"pre_d" * $"post_d").cast("double").as("sxy"),
            sum($"pre_d" * $"pre_d").cast("double").as("sxx"))
          .select(
            (($"n" * $"sxy" - $"sx" * $"sy") /
              ($"n" * $"sxx" - $"sx" * $"sx")).as("theta"),
            ($"sx" / $"n").as("mean_pre"))
        u.groupBy($"variant")
          .agg(
            count(lit(1)).as("n_users"),
            count(lit(1)).cast("double").as("nv"),
            sum($"pre_d").cast("double").as("sxv"),
            sum($"post_d").cast("double").as("syv"),
            sum($"pre_d" * $"post_d").cast("double").as("sxyv"),
            sum($"pre_d" * $"pre_d").cast("double").as("sxxv"),
            sum($"post_d" * $"post_d").cast("double").as("syyv"))
          .crossJoin(broadcast(th))
          .select($"variant", $"n_users",
            round($"syv" / $"nv", 4).as("mean_post"),
            round($"syv" / $"nv" -
              $"theta" * ($"sxv" / $"nv" - $"mean_pre"), 4).as("mean_cuped"),
            round(lit(1.0) -
              (($"syyv" / $"nv" - ($"syv" / $"nv") * ($"syv" / $"nv")) -
                lit(2.0) * $"theta" *
                  ($"sxyv" / $"nv" - ($"sxv" / $"nv") * ($"syv" / $"nv")) +
                $"theta" * $"theta" *
                  ($"sxxv" / $"nv" - ($"sxv" / $"nv") * ($"sxv" / $"nv"))) /
              ($"syyv" / $"nv" - ($"syv" / $"nv") * ($"syv" / $"nv")), 6)
              .as("var_reduction"))
          .orderBy($"variant")
      },
      Some("""WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        u AS (
          SELECT user_id, user_id % 2 AS variant,
            CAST(sum(CASE WHEN CAST(ts AS DATE) < d0 + INTERVAL 14 DAY
                     AND event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(12,2))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(15,2)) AS pre_d,
            CAST(sum(CASE WHEN CAST(ts AS DATE) >= d0 + INTERVAL 14 DAY
                     AND event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(12,2))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(15,2)) AS post_d
          FROM events, bounds GROUP BY 1, 2),
        th AS (
          SELECT (n*sxy - sx*sy) / (n*sxx - sx*sx) AS theta, sx / n AS mean_pre
          FROM (SELECT CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(pre_d) AS DOUBLE) AS sx,
              CAST(sum(post_d) AS DOUBLE) AS sy,
              CAST(sum(pre_d * post_d) AS DOUBLE) AS sxy,
              CAST(sum(pre_d * pre_d) AS DOUBLE) AS sxx FROM u)),
        v AS (
          SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
            CAST(count(*) AS DOUBLE) AS nv,
            CAST(sum(pre_d) AS DOUBLE) AS sxv,
            CAST(sum(post_d) AS DOUBLE) AS syv,
            CAST(sum(pre_d * post_d) AS DOUBLE) AS sxyv,
            CAST(sum(pre_d * pre_d) AS DOUBLE) AS sxxv,
            CAST(sum(post_d * post_d) AS DOUBLE) AS syyv
          FROM u GROUP BY 1)
        SELECT variant, n_users,
          round(syv / nv, 4) AS mean_post,
          round(syv / nv - theta * (sxv / nv - mean_pre), 4) AS mean_cuped,
          round(1 -
            ((syyv / nv - (syv / nv) * (syv / nv)) -
              2 * theta * (sxyv / nv - (sxv / nv) * (syv / nv)) +
              theta * theta * (sxxv / nv - (sxv / nv) * (sxv / nv))) /
            (syyv / nv - (syv / nv) * (syv / nv)), 6) AS var_reduction
        FROM v, th ORDER BY variant""")),

    // ---- Sample-ratio-mismatch guard: the FIRST check any experiment
    // readout must pass — a 50/50 assignment whose realized user counts
    // fail the χ² test (df=1, α=0.05 ⇒ 3.84) means the assignment or
    // logging is broken and the z-test/CUPED numbers are garbage. One
    // distinct + one aggregate; the statistic is integer arithmetic until
    // a single division. ----
    QueryDef(
      "an_ab_srm_check",
      (s, dir) => {
        import s.implicits._
        val u = t(s, dir, "events")
          .select($"user_id", ($"user_id" % 2).as("variant")).distinct()
        val v = u.agg(
          sum(when($"variant" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"variant" === 1, 1L).otherwise(0L)).as("n_b"))
        val chi = ($"n_a" - $"n_b") * ($"n_a" - $"n_b") /
          ($"n_a" + $"n_b").cast("double")
        v.select($"n_a", $"n_b", round(chi, 6).as("chi2"),
          when(chi > 3.841459, 1).otherwise(0).as("srm_flag"))
      },
      Some("""WITH u AS (
          SELECT DISTINCT user_id, user_id % 2 AS variant FROM events),
        v AS (SELECT
          CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
          CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b
          FROM u)
        SELECT n_a, n_b,
          round((n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b), 6) AS chi2,
          CASE WHEN (n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b) > 3.841459
               THEN 1 ELSE 0 END AS srm_flag
        FROM v""")),

    // ---- Session-path pattern matching (MATCH_RECOGNIZE-lite): sessionize
    // with a 30-min gap, render each session's time-ordered event-type
    // sequence as ONE string per session, and regex-match funnel patterns
    // against it. Scale shape: both session windows share a single
    // user-keyed exchange; the path string is bounded by session length
    // (watermark-bounded in the streaming twin), patterns ride a 3-row
    // literal broadcast, and the final aggregate is per-pattern. The
    // struct array_sort makes the concat order total (ts, event_id), so
    // DuckDB's ordered string_agg replays it exactly. ----
    QueryDef(
      "an_session_paths_pattern",
      (s, dir) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val prevTs = lag($"ts", 1).over(byUser)
        val newS = when(prevTs.isNull ||
          (unix_timestamp($"ts") - unix_timestamp(prevTs)) > 1800, 1L)
          .otherwise(0L)
        val paths = t(s, dir, "events")
          .withColumn("session_seq", sum(newS).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_seq")
          .agg(array_join(transform(
            array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
            x => x.getField("event_type")), ">").as("path"))
        val pats = Seq(
          ("view_to_purchase", "view.*purchase"),
          ("signup_then_error", "signup.*error"),
          ("double_click", "click>click")).toDF("pattern_name", "re")
        paths.crossJoin(broadcast(pats))
          .groupBy($"pattern_name")
          .agg(
            sum(when(expr("path RLIKE re"), 1L).otherwise(0L)).as("n_matched"),
            count(lit(1)).as("n_sessions"))
          .select($"pattern_name", $"n_matched", $"n_sessions",
            round($"n_matched" / $"n_sessions".cast("double"), 6).as("share"))
          .orderBy($"pattern_name")
      },
      Some("""WITH s AS (
          SELECT user_id, ts, event_id, event_type,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts, event_id, event_type,
            sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM s),
        paths AS (
          SELECT user_id, session_seq,
            string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          FROM sess GROUP BY 1, 2),
        pats AS (SELECT * FROM (VALUES
          ('view_to_purchase', 'view.*purchase'),
          ('signup_then_error', 'signup.*error'),
          ('double_click', 'click>click')) p(pattern_name, re))
        SELECT pattern_name,
          CAST(count(*) FILTER (WHERE regexp_matches(path, re)) AS BIGINT) AS n_matched,
          CAST(count(*) AS BIGINT) AS n_sessions,
          round(count(*) FILTER (WHERE regexp_matches(path, re)) * 1.0
            / count(*), 6) AS share
        FROM paths CROSS JOIN pats
        GROUP BY pattern_name ORDER BY pattern_name""")),

    // ---- differentially-private histogram release (governance: the
    // counts a dataset card can publish). Laplace(1/ε) noise via the
    // inverse CDF over an ENGINE-NEUTRAL md5-derived uniform (the same
    // seeded-hash family as the dedup signatures), so DuckDB recomputes
    // the identical release — deterministic-by-construction DP noise is
    // exactly how auditable pipelines do it (seed + key → noise). Groups
    // under the k=5 anonymity floor are suppressed before release. One
    // combinable aggregate; noise is per-GROUP, O(groups) work. ----
    QueryDef(
      "an_dp_histogram",
      (s, dir) => {
        import s.implicits._
        val g = t(s, dir, "documents")
          .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
          .filter($"n" >= 5) // k-anonymity floor: tiny groups never release
        // u ∈ (-0.5, 0.5) strictly (the +0.5 half-step keeps both ln(0)
        // endpoints out of range); ε = 1 → scale b = 1
        val u = (expr(
          "conv(substring(md5(concat('dp:', lang, '/', source)), 1, 8), 16, 10)")
          .cast("double") + 0.5) / 4294967296.0 - 0.5
        g.select($"lang", $"source",
            round($"n" + (-signum(u) * log(lit(1.0) - lit(2.0) * abs(u))), 4)
              .as("dp_count"))
          .orderBy($"lang", $"source")
      },
      Some("""WITH g AS (
          SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
        noised AS (
          SELECT lang, source, n,
            (CAST('0x' || substring(md5('dp:' || lang || '/' || source), 1, 8) AS BIGINT)
              + 0.5) / 4294967296.0 - 0.5 AS u
          FROM g WHERE n >= 5)
        SELECT lang, source,
          round(n + (-sign(u) * ln(1 - 2*abs(u))), 4) AS dp_count
        FROM noised ORDER BY lang, source""")),

    // ---- experiment power analysis (the planning sibling of the
    // z-test/CUPED/SRM readouts): measured baseline conversion (high-value
    // customers, exact DECIMAL purchase totals so the threshold comparison
    // is engine-exact) → required sample size per arm for a grid of
    // absolute lifts at α=0.05 / 80% power (z = 1.96 / 0.8416, normal
    // approximation). One combinable aggregate + scalar arithmetic. ----
    QueryDef(
      "an_power_analysis",
      (s, dir) => {
        import s.implicits._
        val dec = org.apache.spark.sql.types.DecimalType(12, 2)
        val per = t(s, dir, "events")
          .groupBy($"user_id")
          .agg(coalesce(sum(when($"event_type" === "purchase",
            $"value".cast(dec))), lit(0).cast(dec)).as("pv"))
        val base = per.agg(count(lit(1)).as("users"),
          sum(when($"pv" > 600, 1L).otherwise(0L)).as("conv"))
        val grid = Seq(0.01, 0.02, 0.05).toDF("delta")
        val z2 = lit((1.96 + 0.8416) * (1.96 + 0.8416))
        base.crossJoin(grid)
          .withColumn("p1", $"conv" / $"users".cast("double"))
          .withColumn("p2", $"p1" + $"delta")
          .select($"delta",
            round($"p1", 6).as("p1"),
            round($"p2", 6).as("p2"),
            ceil(z2 * ($"p1" * (lit(1.0) - $"p1") + $"p2" * (lit(1.0) - $"p2"))
              / ($"delta" * $"delta")).cast("long").as("n_per_arm"))
          .orderBy($"delta")
      },
      Some("""WITH per AS (
          SELECT user_id,
            coalesce(sum(CAST(value AS DECIMAL(12,2)))
              FILTER (WHERE event_type = 'purchase'), 0) AS pv
          FROM events GROUP BY user_id),
        base AS (
          SELECT CAST(count(*) AS BIGINT) AS users,
            CAST(count(*) FILTER (WHERE pv > 600) AS BIGINT) AS conv FROM per),
        grid AS (SELECT unnest([0.01, 0.02, 0.05]) AS delta)
        SELECT delta,
          round(conv / CAST(users AS DOUBLE), 6) AS p1,
          round(conv / CAST(users AS DOUBLE) + delta, 6) AS p2,
          CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416)
            * ((conv/CAST(users AS DOUBLE)) * (1 - conv/CAST(users AS DOUBLE))
              + (conv/CAST(users AS DOUBLE) + delta)
                * (1 - conv/CAST(users AS DOUBLE) - delta))
            / (delta * delta)) AS BIGINT) AS n_per_arm
        FROM base CROSS JOIN grid ORDER BY delta"""))
  )
}
