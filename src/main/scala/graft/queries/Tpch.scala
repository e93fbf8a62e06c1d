package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** TPC-H q1–q12 analogs over the driver parquet schema (FIXTURES.md §B:
  * no partsupp, no shipmode/commitdate/receiptdate/comment columns, money as
  * double, dates as timestamp). Mirrors the reference's correctness corpus
  * (`qurious/tests/tpch/q1.slt` … `q12.slt`, SF 0.01) re-targeted at the
  * driver tables; queries whose original shape needs a missing table/column
  * keep the *operator shape* (correlated scalar subquery, EXISTS decorrelation,
  * interval arithmetic, …) with available columns.
  *
  * Determinism strategy for the DuckDB hash-oracle: money doubles are cast to
  * bounded decimals before any arithmetic/aggregation (exact, associative —
  * partition order can't change the result), and final aggregates are cast
  * back to double. All intermediate decimal types stay ≤ precision 38 so
  * neither engine rounds. Every query ends in a total ORDER BY.
  */
object Tpch extends QueryModule {

  // Bounded decimal casts: exact for the generated data
  // (prices < 1e10, rates < 10 with 2 decimal digits).
  private val money = DecimalType(12, 2)
  private val rate = DecimalType(4, 2)
  private def m(c: Column): Column = c.cast(money)
  private def r(c: Column): Column = c.cast(rate)
  // (1 ± rate) recast to rate so products stay narrow enough to be exact:
  // (12,2)*(4,2)=(17,4), *(4,2)=(22,6), sum=(32,6) — all < 38, no rounding.
  private def oneMinus(c: Column): Column = (lit(1) - r(c)).cast(rate)
  private def onePlus(c: Column): Column = (lit(1) + r(c)).cast(rate)
  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  // SQL-side equivalents of the cast helpers (DuckDB dialect).
  private def M(c: String) = s"CAST($c AS DECIMAL(12,2))"
  private def R(c: String) = s"CAST($c AS DECIMAL(4,2))"
  private def OneMinus(c: String) = s"CAST(1 - ${R(c)} AS DECIMAL(4,2))"
  private def OnePlus(c: String) = s"CAST(1 + ${R(c)} AS DECIMAL(4,2))"

  def defs: Seq[QueryDef] = Seq(
    // ---- Q1: pricing summary report (ref qurious/tests/tpch/q1.slt) ----
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= ts("2001-09-02"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(m($"l_quantity")).cast("double").as("sum_qty"),
            sum(m($"l_extendedprice")).cast("double").as("sum_base_price"),
            sum(m($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("sum_disc_price"),
            sum(m($"l_extendedprice") * oneMinus($"l_discount") * onePlus($"l_tax")).cast("double").as("sum_charge"),
            (sum(m($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(m($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
            (sum(r($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(sum(${M("l_quantity")}) AS DOUBLE) AS sum_qty,
        CAST(sum(${M("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
        CAST(sum(${M("l_extendedprice")} * ${OneMinus("l_discount")}) AS DOUBLE) AS sum_disc_price,
        CAST(sum(${M("l_extendedprice")} * ${OneMinus("l_discount")} * ${OnePlus("l_tax")}) AS DOUBLE) AS sum_charge,
        CAST(sum(${M("l_quantity")}) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(${M("l_extendedprice")}) AS DOUBLE) / count(*) AS avg_price,
        CAST(sum(${R("l_discount")}) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- Q2 analog: top-balance supplier per region (correlated scalar
    // subquery shape; ref q2 needs partsupp which the driver data lacks) ----
    QueryDef(
      "q2_top_supplier",
      (s, dir) => {
        import s.implicits._
        val sup = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        val joined = sup
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        // Decorrelated form of: WHERE s_acctbal = (SELECT max(s_acctbal)
        // FROM supplier s2 JOIN nation n2 ... WHERE n2.n_regionkey = n.n_regionkey)
        val mx = joined.groupBy($"r_regionkey".as("mr_key"))
          .agg(max($"s_acctbal").as("max_bal"))
        joined
          .join(broadcast(mx), $"r_regionkey" === $"mr_key" && $"s_acctbal" === $"max_bal")
          .select($"r_name", $"n_name", $"s_name", $"s_acctbal")
          .orderBy($"r_name", $"n_name", $"s_name")
      },
      Some("""SELECT r_name, n_name, s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE s_acctbal = (SELECT max(s2.s_acctbal)
                           FROM supplier s2 JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                           WHERE n2.n_regionkey = region.r_regionkey)
        ORDER BY r_name, n_name, s_name""")),

    // ---- Q3: shipping priority (ref q3.slt; no o_shippriority column) ----
    QueryDef(
      "q3_shipping_priority",
      (s, dir) => {
        import s.implicits._
        val cutoff = ts("1998-07-01")
        t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .filter($"o_orderdate" < cutoff)
          .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .filter($"l_shipdate" > cutoff)
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(sum(m($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate,
        CAST(sum(${M("l_extendedprice")} * ${OneMinus("l_discount")}) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""")),

    // ---- Q4: order priority checking — EXISTS → left-semi join ----
    QueryDef(
      "q4_order_priority",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1998-01-01"))
        val l = t(s, dir, "lineitem")
        o.join(l, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Q5: local supplier volume ----
    QueryDef(
      "q5_local_supplier",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1998-01-01"))
          .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .join(t(s, dir, "supplier"),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "ASIA")
          .groupBy($"n_name")
          .agg(sum(m($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(s"""SELECT n_name,
        CAST(sum(${M("l_extendedprice")} * ${OneMinus("l_discount")}) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
                      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- Q6: forecasting revenue change (ref q6.slt) ----
    QueryDef(
      "q6_forecast_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter(
            $"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
          .agg(sum(m($"l_extendedprice") * r($"l_discount")).cast("double").as("revenue"))
      },
      Some(s"""SELECT CAST(sum(${M("l_extendedprice")} * ${R("l_discount")}) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""")),

    // ---- Q7: volume shipping between two nations ----
    QueryDef(
      "q7_volume_shipping",
      (s, dir) => {
        import s.implicits._
        // Pre-filter both nation dims to the two regions the cross-pair
        // predicate can accept, and join them BEFORE the fact joins: the
        // broadcast hash joins then prune out-of-region suppliers/customers
        // at the scan side, so ineligible rows never enter the lineitem/
        // orders shuffles (the OR filter below still removes the same-region
        // 2-2 / 3-3 combinations).
        val n1 = t(s, dir, "nation").filter($"n_regionkey".isin(2, 3)).select(
          $"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"), $"n_regionkey".as("supp_region"))
        val n2 = t(s, dir, "nation").filter($"n_regionkey".isin(2, 3)).select(
          $"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"), $"n_regionkey".as("cust_region"))
        val supp = t(s, dir, "supplier").join(broadcast(n1), $"s_nationkey" === $"n1_key")
        val cust = t(s, dir, "customer").join(broadcast(n2), $"c_nationkey" === $"n2_key")
        supp
          .join(t(s, dir, "lineitem"), $"s_suppkey" === $"l_suppkey")
          .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1998-01-01"))
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .filter(
            ($"supp_region" === 2 && $"cust_region" === 3) ||
              ($"supp_region" === 3 && $"cust_region" === 2))
          .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("l_year"))
          .agg(sum(m($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        extract(year FROM l_shipdate) AS l_year,
        CAST(sum(${M("l_extendedprice")} * ${OneMinus("l_discount")}) AS DOUBLE) AS revenue
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                      JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_regionkey = 2 AND n2.n_regionkey = 3)
            OR (n1.n_regionkey = 3 AND n2.n_regionkey = 2))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""")),

    // ---- Q8: national market share ----
    QueryDef(
      "q8_market_share",
      (s, dir) => {
        import s.implicits._
        val volume = m($"l_extendedprice") * oneMinus($"l_discount")
        t(s, dir, "part").filter($"p_type" === "ECONOMY")
          .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1998-01-01"))
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "AMERICA")
          .groupBy(year($"o_orderdate").cast("long").as("o_year"))
          .agg((
            sum(when($"n_name" === "NATION_1", volume).otherwise(lit(0)).cast(DecimalType(32, 6))).cast("double") /
              sum(volume.cast(DecimalType(32, 6))).cast("double")).as("mkt_share"))
          .orderBy($"o_year")
      },
      Some(s"""SELECT extract(year FROM o_orderdate) AS o_year,
        CAST(sum(CASE WHEN n_name = 'NATION_1'
                      THEN CAST(${M("l_extendedprice")} * ${OneMinus("l_discount")} AS DECIMAL(32,6))
                      ELSE CAST(0 AS DECIMAL(32,6)) END) AS DOUBLE)
          / CAST(sum(CAST(${M("l_extendedprice")} * ${OneMinus("l_discount")} AS DECIMAL(32,6))) AS DOUBLE) AS mkt_share
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1 ORDER BY o_year""")),

    // ---- Q9 analog: product-type profit (partsupp.ps_supplycost replaced
    // by a retail-price-based cost model over available columns) ----
    QueryDef(
      "q9_product_profit",
      (s, dir) => {
        import s.implicits._
        val cost = (m($"p_retailprice") * m($"l_quantity") * lit(BigDecimal("0.1"))).cast(DecimalType(30, 6))
        val amount = (m($"l_extendedprice") * oneMinus($"l_discount")).cast(DecimalType(30, 6)) - cost
        t(s, dir, "part").filter($"p_type".isin("ECONOMY", "PROMO"))
          .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey")
          .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
          .agg(sum(amount).cast("double").as("sum_profit"))
          .orderBy($"nation", $"o_year".desc)
      },
      Some(s"""SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year,
        CAST(sum(CAST(${M("l_extendedprice")} * ${OneMinus("l_discount")} AS DECIMAL(30,6))
               - CAST(${M("p_retailprice")} * ${M("l_quantity")} * 0.1 AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN orders ON l_orderkey = o_orderkey
        WHERE p_type IN ('ECONOMY', 'PROMO')
        GROUP BY 1, 2 ORDER BY nation, o_year DESC""")),

    // ---- Q10: returned item reporting ----
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1997-07-01"))
          .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .filter($"l_returnflag" === "R")
          .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
          .agg(sum(m($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        CAST(sum(${M("l_extendedprice")} * ${OneMinus("l_discount")}) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---- Q11 analog: important stock — scalar subquery threshold in
    // HAVING (ref q11 needs partsupp; same shape over supplier balances) ----
    QueryDef(
      "q11_important_balances",
      (s, dir) => {
        import s.implicits._
        val sup = t(s, dir, "supplier")
        val grouped = sup
          .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(sum(m($"s_acctbal")).as("total_bal_dec"))
        // Scalar subquery, decorrelated as a broadcast cross join of a 1-row agg.
        val threshold = sup.agg(
          (sum(m($"s_acctbal")) * lit(BigDecimal("0.02"))).as("threshold"))
        grouped.crossJoin(broadcast(threshold))
          .filter($"total_bal_dec" > $"threshold")
          .select($"n_name", $"total_bal_dec".cast("double").as("total_bal"))
          .orderBy($"total_bal".desc, $"n_name")
      },
      Some(s"""SELECT n_name, CAST(sum(${M("s_acctbal")}) AS DOUBLE) AS total_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING sum(${M("s_acctbal")}) > (SELECT sum(${M("s_acctbal")}) * 0.02 FROM supplier)
        ORDER BY total_bal DESC, n_name""")),

    // ---- Q12 analog: shipping-delay priority buckets (no l_shipmode /
    // commit/receipt dates — keeps the CASE-sum + interval-arithmetic shape) ----
    QueryDef(
      "q12_priority_buckets",
      (s, dir) => {
        import s.implicits._
        val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
        t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .filter(
            $"l_shipdate" >= $"o_orderdate" &&
              $"l_shipdate" < $"o_orderdate" + expr("INTERVAL 90 DAYS") &&
              $"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
          .groupBy($"l_returnflag")
          .agg(
            sum(when(high, 1).otherwise(0)).as("high_line_count"),
            sum(when(!high, 1).otherwise(0)).as("low_line_count"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 90 DAY
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
