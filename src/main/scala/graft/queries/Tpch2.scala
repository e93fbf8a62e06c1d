package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** TPC-H q13–q22 analogs. The reference stops at q12 because its engine
  * lacks what the later queries need — count-distinct, IN-subqueries (its
  * planner panics, `qurious/src/planner/sql.rs:1142`), anti-join chains,
  * set ops (SURVEY.md §5) — so these are pure "beyond reference" surface:
  * the queries a reference user could not run today. Adapted to the driver
  * schema (no partsupp/phone/comment/shipmode columns) with the same
  * decimal-cast determinism strategy as [[Tpch]].
  */
object Tpch2 extends QueryModule {

  private val money = DecimalType(12, 2)
  private val rate = DecimalType(4, 2)
  private def m(c: Column): Column = c.cast(money)
  private def r(c: Column): Column = c.cast(rate)
  private def oneMinus(c: Column): Column = (lit(1) - r(c)).cast(rate)
  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def M(c: String) = s"CAST($c AS DECIMAL(12,2))"
  private def OneMinus(c: String) = s"CAST(1 - CAST($c AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  def defs: Seq[QueryDef] = Seq(
    // ---- Q13: customer order-count distribution (left join + two-level agg) ----
    QueryDef(
      "q13_cust_distribution",
      (s, dir) => {
        import s.implicits._
        val counts = t(s, dir, "customer")
          .join(t(s, dir, "orders").filter($"o_orderpriority" =!= "1-URGENT"),
            $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
        counts.groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // ---- Q14: promotion revenue share ----
    QueryDef(
      "q14_promo_revenue",
      (s, dir) => {
        import s.implicits._
        val rev = (m($"l_extendedprice") * oneMinus($"l_discount")).cast(DecimalType(32, 6))
        t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1997-09-01") && $"l_shipdate" < ts("1997-10-01"))
          .join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
          .agg((lit(100.0) *
            sum(when($"p_type" === "PROMO", rev).otherwise(lit(0).cast(DecimalType(32, 6)))).cast("double") /
            sum(rev).cast("double")).as("promo_revenue"))
      },
      Some(s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
            THEN CAST(${M("l_extendedprice")} * ${OneMinus("l_discount")} AS DECIMAL(32,6))
            ELSE CAST(0 AS DECIMAL(32,6)) END) AS DOUBLE)
          / CAST(sum(CAST(${M("l_extendedprice")} * ${OneMinus("l_discount")} AS DECIMAL(32,6))) AS DOUBLE)
          AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""")),

    // ---- Q15: top supplier(s) by quarterly revenue (view + scalar max) ----
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        import s.implicits._
        // the explicit isNotNull keeps BOTH consumers' scan subtrees
        // canonically identical: the supplier join infers it on its branch
        // only, which would split the revenue aggregate into two lineitem
        // scans instead of one ReusedExchange (PlanSpec guards this)
        val revenue = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1997-04-01") &&
            $"l_suppkey".isNotNull)
          .groupBy($"l_suppkey".as("supplier_no"))
          .agg(sum(m($"l_extendedprice") * oneMinus($"l_discount")).as("total_rev"))
        val mx = revenue.agg(max($"total_rev").as("mx"))
        t(s, dir, "supplier")
          .join(revenue, $"s_suppkey" === $"supplier_no")
          .crossJoin(broadcast(mx))
          .filter($"total_rev" === $"mx")
          .select($"s_suppkey", $"s_name", $"total_rev".cast("double").as("total_revenue"))
          .orderBy($"s_suppkey")
      },
      Some(s"""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(${M("l_extendedprice")} * ${OneMinus("l_discount")}) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        ORDER BY s_suppkey""")),

    // ---- Q16: supplier count by part attributes (count distinct + NOT IN) ----
    QueryDef(
      "q16_parts_supplier_cnt",
      (s, dir) => {
        import s.implicits._
        val excluded = t(s, dir, "supplier").filter($"s_acctbal" < 0)
          .select($"s_suppkey".as("x_suppkey"))
        t(s, dir, "part")
          .filter($"p_brand" =!= "Brand#1" && $"p_size".isin(5, 10, 15, 20))
          .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey")
          .join(broadcast(excluded), $"l_suppkey" === $"x_suppkey", "left_anti")
          .groupBy($"p_brand", $"p_type", $"p_size")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
      },
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ---- Q17: small-quantity-order revenue (correlated avg subquery,
    // decorrelated as a per-part aggregate join) ----
    QueryDef(
      "q17_small_qty_revenue",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val brandParts = t(s, dir, "part").filter($"p_brand" === "Brand#3")
        // Classic q17 rewrite: the per-part average only matters for parts
        // that survive the brand filter, so a broadcast semi-join restricts
        // the aggregate's input to those parts' lineitems (~25x less data
        // through the groupBy at TPC-H brand selectivity). The average per
        // surviving part is computed over exactly the same rows as before,
        // so the result is bit-identical.
        val partAvg = li
          .join(broadcast(brandParts.select($"p_partkey".as("bp_key"))),
            $"l_partkey" === $"bp_key", "left_semi")
          .groupBy($"l_partkey".as("avg_partkey"))
          .agg((sum(m($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
        brandParts
          .join(li, $"p_partkey" === $"l_partkey")
          .join(partAvg, $"p_partkey" === $"avg_partkey")
          .filter($"l_quantity" < $"avg_qty" * 0.2)
          .agg((sum(m($"l_extendedprice")).cast("double") / 7.0).as("avg_yearly"))
      },
      Some(s"""SELECT CAST(sum(${M("l_extendedprice")}) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < (SELECT CAST(sum(${M("l_quantity")}) AS DOUBLE) / count(*)
                            FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey) * 0.2""")),

    // ---- Q18: large-volume customers (HAVING over join + semi join back) ----
    QueryDef(
      "q18_large_orders",
      (s, dir) => {
        import s.implicits._
        val bigOrders = t(s, dir, "lineitem")
          .groupBy($"l_orderkey".as("big_okey"))
          .agg(sum(m($"l_quantity")).as("sum_qty"))
          .filter($"sum_qty" > 150)
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .join(bigOrders, $"o_orderkey" === $"big_okey")
          .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
            $"o_totalprice", $"sum_qty".cast("double").as("total_qty"))
          .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
          .limit(100)
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
          CAST(sum_qty AS DOUBLE) AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN (SELECT l_orderkey AS big_okey, sum(${M("l_quantity")}) AS sum_qty
              FROM lineitem GROUP BY l_orderkey HAVING sum(${M("l_quantity")}) > 150) b
          ON o_orderkey = big_okey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""")),

    // ---- Q19: disjunctive predicate revenue ----
    QueryDef(
      "q19_disjunctive_filter",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
          .filter(
            ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
              ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
              ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30)))
          .agg(sum(m($"l_extendedprice") * oneMinus($"l_discount")).cast("double").as("revenue"))
      },
      Some(s"""SELECT CAST(sum(${M("l_extendedprice")} * ${OneMinus("l_discount")}) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""")),

    // ---- Q20 analog: suppliers who shipped heavily in a year (nested IN
    // subqueries; ps_availqty replaced by shipped-quantity threshold) ----
    QueryDef(
      "q20_active_suppliers",
      (s, dir) => {
        import s.implicits._
        val promoParts = t(s, dir, "part").filter($"p_type" === "PROMO")
          .select($"p_partkey")
        val heavyShippers = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
          .join(broadcast(promoParts), $"l_partkey" === $"p_partkey", "left_semi")
          .groupBy($"l_suppkey")
          .agg(sum(m($"l_quantity")).as("shipped"))
          .filter($"shipped" > 100)
          .select($"l_suppkey")
        t(s, dir, "supplier")
          .join(heavyShippers, $"s_suppkey" === $"l_suppkey", "left_semi")
          .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
          .select($"s_name", $"n_name")
          .orderBy($"s_name")
      },
      Some(s"""SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey HAVING sum(${M("l_quantity")}) > 100)
        ORDER BY s_name""")),

    // ---- Q21 analog: sole late shipper in multi-supplier orders
    // (EXISTS + NOT EXISTS chain; "late" = shipped > 60 days after order) ----
    QueryDef(
      "q21_late_shippers",
      (s, dir) => {
        import s.implicits._
        // The EXISTS / NOT EXISTS pair decorrelates to ONE per-order
        // aggregate: "another supplier exists" ⇔ distinct suppliers in the
        // order ≥ 2; "no other late supplier" ⇔ distinct LATE suppliers = 1
        // (the late pair's own supplier). One shuffle on orderkey replaces
        // the distinct→semi→anti chain (3 wide stages + a full-lineitem
        // distinct broadcast) the naive translation produces — the shape
        // that survives 100×: lineitem streams through a single hash
        // aggregate keyed on the join key it already shuffled on.
        val li = t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate")
          .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .select(
            $"l_orderkey", $"l_suppkey",
            ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")).as("is_late"))
        // Two-phase instead of countDistinct: the multi-distinct aggregate
        // would Expand every row ×3 before the shuffle; aggregating to
        // (order, supplier) grain first ships each pair once.
        val perPair = li.groupBy($"l_orderkey", $"l_suppkey")
          .agg(max($"is_late").as("is_late"))
        val perOrder = perPair.groupBy($"l_orderkey")
          .agg(
            count(lit(1)).as("n_supp"),
            sum(when($"is_late", 1L).otherwise(0L)).as("n_late_supp"),
            max(when($"is_late", $"l_suppkey")).as("late_supp"))
          .filter($"n_supp" > 1 && $"n_late_supp" === 1)
        perOrder
          .join(broadcast(t(s, dir, "supplier")), $"late_supp" === $"s_suppkey")
          .groupBy($"s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy($"numwait".desc, $"s_name")
      },
      Some("""WITH late AS (
          SELECT DISTINCT o_orderkey AS okey, l_suppkey AS skey
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
        pairs AS (SELECT DISTINCT l_orderkey AS o2key, l_suppkey AS s2key FROM lineitem)
        SELECT s_name, count(*) AS numwait
        FROM late JOIN supplier ON skey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM pairs
                      WHERE o2key = late.okey AND s2key <> late.skey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.okey = late.okey AND l3.skey <> late.skey)
        GROUP BY s_name ORDER BY numwait DESC, s_name""")),

    // ---- Q22 analog: dormant high-balance customers by nation bucket
    // (scalar avg subquery + NOT EXISTS; phone country code → nationkey) ----
    QueryDef(
      "q22_dormant_customers",
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
        val avgBal = cust.filter($"c_acctbal" > 0)
          .agg((sum(m($"c_acctbal")).cast("double") / count(lit(1))).as("avg_bal"))
        val recent = t(s, dir, "orders")
          .filter($"o_orderdate" >= ts("1999-01-01"))
          .select($"o_custkey")
        cust
          .crossJoin(broadcast(avgBal))
          .filter($"c_acctbal" > $"avg_bal")
          .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy(($"c_nationkey" % 5).as("cntry_bucket"))
          .agg(
            count(lit(1)).as("numcust"),
            sum(m($"c_acctbal")).cast("double").as("totacctbal"))
          .orderBy($"cntry_bucket")
      },
      Some(s"""SELECT c_nationkey % 5 AS cntry_bucket, count(*) AS numcust,
          CAST(sum(${M("c_acctbal")}) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(sum(${M("c_acctbal")}) AS DOUBLE) / count(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY 1 ORDER BY cntry_bucket"""))
  )
}
