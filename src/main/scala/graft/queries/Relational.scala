package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** One query per relational operator / expression in SURVEY.md §2.2–§2.7.
  *
  * The reference implements these as hand-rolled physical operators
  * (hash/nested-loop/cross joins in `qurious/src/physical/plan/join/`,
  * hash + no-grouping aggregate in `physical/plan/aggregate/`, sort/limit/
  * values/empty in `physical/plan/`, expression kernels in
  * `physical/expr/`); here each is the idiomatic Dataset combinator and
  * Catalyst/Tungsten pick the physical strategy (broadcast vs shuffle joins,
  * TakeOrderedAndProject for top-N, whole-stage codegen).
  *
  * Queries marked "beyond reference" cover surface the reference parses but
  * cannot execute (IN-subquery `planner/sql.rs:1142` todo!(), DISTINCT
  * silently dropped `planner/sql.rs:550-662`, no UNION/INTERSECT/EXCEPT, no
  * window functions) — implemented properly per SURVEY §7.2 step 5.
  */
object Relational extends QueryModule {

  private val money = DecimalType(12, 2)
  private def m(c: Column): Column = c.cast(money)
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  /** Small typed table with NULLs for null-semantics queries (driver parquet
    * has no null cells). Same rows on the DuckDB side via a VALUES clause. */
  private def nullTable(s: SparkSession): DataFrame =
    s.sql("""SELECT * FROM VALUES
        (1, 10,   CAST(1.5 AS DOUBLE), true,  'alpha'),
        (2, NULL, CAST(2.5 AS DOUBLE), false, 'beta'),
        (3, 30,   NULL,                NULL,  NULL),
        (4, NULL, NULL,                true,  'delta'),
        (5, 50,   CAST(5.5 AS DOUBLE), NULL,  'epsilon')
      AS t(id, v, x, b, s)""")

  private val nullTableSql =
    """(VALUES (1, 10, CAST(1.5 AS DOUBLE), true, 'alpha'),
               (2, NULL, CAST(2.5 AS DOUBLE), false, 'beta'),
               (3, 30, NULL, NULL, NULL),
               (4, NULL, NULL, true, 'delta'),
               (5, 50, CAST(5.5 AS DOUBLE), NULL, 'epsilon')) AS t(id, v, x, b, s)"""

  def defs: Seq[QueryDef] = Seq(
    // ---- Projection: expression evaluation per row (ref projection.rs) ----
    QueryDef(
      "op_projection",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_orderkey" < 100)
          .select(
            $"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net"),
            (-$"l_quantity").as("neg_qty"),
            ($"l_orderkey" % 7).as("mod7"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1 - l_discount) AS net,
        -l_quantity AS neg_qty,
        l_orderkey % 7 AS mod7
        FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""")),

    // ---- Filter: compound predicates incl. BETWEEN / IN / LIKE (ref
    // filter.rs + planner rewrites sql.rs:1042-1099) ----
    QueryDef(
      "op_filter_compound",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .filter(
            ($"p_size".between(10, 20) && $"p_type".isin("ECONOMY", "PROMO")) ||
              ($"p_name".like("%widget%") && !$"p_brand".like("Brand#1_")))
          .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        WHERE (p_size BETWEEN 10 AND 20 AND p_type IN ('ECONOMY','PROMO'))
           OR (p_name LIKE '%widget%' AND p_brand NOT LIKE 'Brand#1_')
        ORDER BY p_partkey""")),

    // ---- Joins (ref hash_join.rs / nest_loop_join.rs / cross_join.rs) ----
    QueryDef(
      "op_join_inner",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"s_name", $"n_name")
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, n_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey""")),

    QueryDef(
      "op_join_left",
      (s, dir) => {
        import s.implicits._
        val rich = t(s, dir, "supplier").filter($"s_acctbal" > 5000)
        t(s, dir, "nation")
          .join(rich, $"n_nationkey" === $"s_nationkey", "left")
          .select($"n_nationkey", $"n_name", $"s_suppkey", $"s_name")
          .orderBy($"n_nationkey", $"s_suppkey".asc_nulls_first)
      },
      Some("""SELECT n_nationkey, n_name, s_suppkey, s_name FROM nation
        LEFT JOIN (SELECT * FROM supplier WHERE s_acctbal > 5000) s
          ON n_nationkey = s_nationkey
        ORDER BY n_nationkey, s_suppkey NULLS FIRST""")),

    QueryDef(
      "op_join_right",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "supplier").filter($"s_acctbal" > 5000)
          .join(t(s, dir, "nation"), $"s_nationkey" === $"n_nationkey", "right")
          .select($"n_nationkey", $"n_name", $"s_suppkey")
          .orderBy($"n_nationkey", $"s_suppkey".asc_nulls_first)
      },
      Some("""SELECT n_nationkey, n_name, s_suppkey
        FROM (SELECT * FROM supplier WHERE s_acctbal > 5000) s
        RIGHT JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_nationkey, s_suppkey NULLS FIRST""")),

    QueryDef(
      "op_join_full",
      (s, dir) => {
        import s.implicits._
        // Two disjoint-ish aggregates full-joined on group key: unmatched on
        // both sides exercises the outer-bitmap finalization the reference
        // does in hash_join.rs:277-343.
        val a = t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .groupBy($"o_custkey".as("fk")).agg(count(lit(1)).as("f_orders"))
        val b = t(s, dir, "orders").filter($"o_orderstatus" === "O")
          .groupBy($"o_custkey".as("ok")).agg(count(lit(1)).as("o_orders"))
        a.join(b, $"fk" === $"ok", "full")
          .select(
            coalesce($"fk", $"ok").as("custkey"),
            $"f_orders", $"o_orders")
          .orderBy($"custkey")
      },
      Some("""SELECT coalesce(f.fk, o.ok) AS custkey, f.f_orders, o.o_orders
        FROM (SELECT o_custkey AS fk, count(*) AS f_orders FROM orders
              WHERE o_orderstatus = 'F' GROUP BY 1) f
        FULL JOIN (SELECT o_custkey AS ok, count(*) AS o_orders FROM orders
              WHERE o_orderstatus = 'O' GROUP BY 1) o ON f.fk = o.ok
        ORDER BY custkey""")),

    QueryDef(
      "op_join_semi",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter($"o_totalprice" > 100000),
            $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        ORDER BY c_custkey""")),

    QueryDef(
      "op_join_anti",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey", "left_anti")
          .select($"o_orderkey", $"o_orderstatus")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        ORDER BY o_orderkey""")),

    // Pure theta join → Catalyst plans BroadcastNestedLoopJoin (ref
    // nest_loop_join.rs); kept tiny (nation × region) on purpose.
    QueryDef(
      "op_join_nonequi",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "nation")
          .join(t(s, dir, "region"), $"n_nationkey" < $"r_regionkey")
          .select($"n_nationkey", $"r_regionkey", $"r_name")
          .orderBy($"n_nationkey", $"r_regionkey")
      },
      Some("""SELECT n_nationkey, r_regionkey, r_name FROM nation
        JOIN region ON n_nationkey < r_regionkey
        ORDER BY n_nationkey, r_regionkey""")),

    QueryDef(
      "op_join_cross",
      (s, dir) => {
        import s.implicits._
        val r1 = t(s, dir, "region").select($"r_regionkey".as("a"), $"r_name".as("a_name"))
        val r2 = t(s, dir, "region").select($"r_regionkey".as("b"))
        r1.crossJoin(r2).orderBy($"a", $"b")
      },
      Some("""SELECT r1.r_regionkey AS a, r1.r_name AS a_name, r2.r_regionkey AS b
        FROM region r1 CROSS JOIN region r2 ORDER BY a, b""")),

    // Equi-join with a non-equi residual filter (ref JoinFilter,
    // hash_join.rs residual path).
    QueryDef(
      "op_join_residual_filter",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .join(
            t(s, dir, "lineitem"),
            $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate" &&
              $"l_quantity" > 45,
            "inner")
          .select($"o_orderkey", $"l_linenumber", $"l_quantity")
          .orderBy($"o_orderkey", $"l_linenumber")
      },
      Some("""SELECT o_orderkey, l_linenumber, l_quantity FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
          AND l_shipdate > o_orderdate AND l_quantity > 45
        ORDER BY o_orderkey, l_linenumber""")),

    // ---- Aggregation (ref hash.rs / no_grouping.rs; SUM MIN MAX AVG COUNT
    // is the reference's complete agg set, §2.5) ----
    QueryDef(
      "op_agg_global",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").agg(
          count(lit(1)).as("n"),
          count($"o_custkey").as("n_cust"),
          min($"o_orderdate").as("min_date"),
          max($"o_orderdate").as("max_date"),
          sum(m($"o_totalprice")).cast("double").as("sum_price"),
          (sum(m($"o_totalprice")).cast("double") / count(lit(1))).as("avg_price"),
          min($"o_orderpriority").as("min_prio"),
          max($"o_orderpriority").as("max_prio"))
      },
      Some("""SELECT count(*) AS n, count(o_custkey) AS n_cust,
        min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        min(o_orderpriority) AS min_prio, max(o_orderpriority) AS max_prio
        FROM orders""")),

    QueryDef(
      "op_agg_groupby",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .groupBy($"c_mktsegment", $"c_nationkey")
          .agg(
            count(lit(1)).as("n"),
            sum(m($"c_acctbal")).cast("double").as("total_bal"),
            max($"c_acctbal").as("max_bal"),
            min($"c_acctbal").as("min_bal"))
          .orderBy($"c_mktsegment", $"c_nationkey")
      },
      Some("""SELECT c_mktsegment, c_nationkey, count(*) AS n,
        CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
        max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal
        FROM customer GROUP BY c_mktsegment, c_nationkey
        ORDER BY c_mktsegment, c_nationkey""")),

    // COUNT(*) output-naming parity (ref count_wildcard_rule.rs:8-32 keeps
    // the display name "COUNT(*)" after the COUNT(1) rewrite).
    QueryDef(
      "op_count_star",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").groupBy($"l_returnflag")
          .agg(count(lit(1)).as("COUNT(*)"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS "COUNT(*)" FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Beyond reference: distinct aggregates.
    QueryDef(
      "op_agg_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"),
          sum_distinct(m($"l_quantity")).cast("double").as("sum_dist_qty"))
      },
      Some("""SELECT count(DISTINCT l_orderkey) AS n_orders,
        count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
        CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty
        FROM lineitem""")),

    // ---- Sort / limit (ref sort.rs, limit.rs; nulls-first parity per
    // SURVEY §1.3 — the reference always sorts nulls first) ----
    QueryDef(
      "op_sort_multi",
      (s, dir) => {
        import s.implicits._
        nullTable(s)
          .orderBy($"v".desc_nulls_first, $"id".asc)
          .select($"id", $"v", $"s")
      },
      Some(s"""SELECT id, v, s FROM $nullTableSql
        ORDER BY v DESC NULLS FIRST, id ASC""")),

    QueryDef(
      "op_limit_offset",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").orderBy($"o_orderkey").offset(5).limit(10)
          .select($"o_orderkey", $"o_orderstatus")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
        ORDER BY o_orderkey LIMIT 10 OFFSET 5""")),

    // Limit-over-sort → Spark plans TakeOrderedAndProject (ref top-N
    // fast path, planner/mod.rs:69-83).
    QueryDef(
      "op_topn",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .select($"o_orderkey", $"o_totalprice")
          .limit(15)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""")),

    // ---- Values / empty relation (ref values.rs, empty.rs) ----
    QueryDef(
      "op_values",
      (s, _) =>
        s.sql("""SELECT * FROM VALUES
            (1, 'a', CAST(1.5 AS DOUBLE), true,  DATE '2024-01-01'),
            (2, NULL, CAST(-2.25 AS DOUBLE), false, DATE '2024-06-15'),
            (3, 'c', NULL, NULL, NULL)
          AS t(id, s, x, b, d) ORDER BY id"""),
      Some("""SELECT * FROM (VALUES
          (1, 'a', CAST(1.5 AS DOUBLE), true, DATE '2024-01-01'),
          (2, NULL, CAST(-2.25 AS DOUBLE), false, DATE '2024-06-15'),
          (3, 'c', NULL, NULL, NULL)) AS t(id, s, x, b, d) ORDER BY id""")),

    QueryDef(
      "op_select_no_from",
      (s, _) =>
        s.sql("""SELECT 1 + 2 AS three, 'x' AS s, CAST(2.5 AS DOUBLE) * 2 AS five,
                 NOT false AS t, length('hello') AS len"""),
      Some("""SELECT 1 + 2 AS three, 'x' AS s, CAST(2.5 AS DOUBLE) * 2 AS five,
        NOT false AS t, CAST(length('hello') AS INTEGER) AS len""")),

    // Beyond reference: DISTINCT actually deduplicates (the reference
    // parses it then silently ignores it, planner/sql.rs:550-662).
    QueryDef(
      "op_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .select($"c_mktsegment", $"c_nationkey").distinct()
          .orderBy($"c_mktsegment", $"c_nationkey")
      },
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    // Beyond reference: DISTINCT ON executes with Postgres semantics via the
    // front-door row_number rewrite (the reference parses the ON list then
    // silently drops it, sqlparser/src/parser.rs:581-599). Oracle is DuckDB's
    // native DISTINCT ON over the identical statement.
    QueryDef(
      "op_distinct_on",
      (s, dir) => {
        val g = new graft.GraftSession(s)
        graft.sources.Tables.register(s, dir, Seq("documents"))
        g.sql("""SELECT DISTINCT ON (lang) lang, doc_id, n_chars FROM documents
          ORDER BY lang, n_chars DESC, doc_id""")
      },
      Some("""SELECT DISTINCT ON (lang) lang, doc_id, n_chars FROM documents
        ORDER BY lang, n_chars DESC, doc_id""")),

    // Beyond reference: QUALIFY (DuckDB/Snowflake post-window filter) via
    // the front-door subquery rewrite — the predicate is computed as an
    // extra column in the window's select scope (alias-referencing works
    // through Spark's lateral column alias resolution) and filtered
    // outside. Oracle is DuckDB's native QUALIFY on the same statement.
    QueryDef(
      "op_qualify",
      (s, dir) => {
        val g = new graft.GraftSession(s)
        graft.sources.Tables.register(s, dir, Seq("documents"))
        g.sql("""SELECT lang, doc_id, n_chars,
            row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents QUALIFY rk <= 3 ORDER BY lang, rk""")
      },
      Some("""SELECT lang, doc_id, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents QUALIFY rk <= 3 ORDER BY lang, rk""")),

    // Beyond reference: GROUP BY ALL / ORDER BY ALL (the DuckDB-popularized
    // shorthands, native in Spark 3.4+/4.0+) — group by every non-aggregate
    // select item, order by every output column. Same statement runs
    // verbatim on both engines.
    QueryDef(
      "op_group_order_by_all",
      (s, dir) => {
        val g = new graft.GraftSession(s)
        graft.sources.Tables.register(s, dir, Seq("documents"))
        g.sql("""SELECT lang, source, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS chars
          FROM documents GROUP BY ALL ORDER BY ALL""")
      },
      Some("""SELECT lang, source, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY ALL ORDER BY ALL""")),

    // ---- CASE: searched + simple (ref case.rs; simple CASE is rewritten
    // to searched at plan time, sql.rs:1100-1136) ----
    QueryDef(
      "op_case",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .filter($"o_orderkey" < 500)
          .select(
            $"o_orderkey",
            when($"o_totalprice" > 200000, "big")
              .when($"o_totalprice" > 50000, "mid")
              .otherwise("small").as("bucket"),
            when($"o_orderstatus" === "F", 1)
              .when($"o_orderstatus" === "O", 2)
              .as("status_code"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 200000 THEN 'big'
             WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
        CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 END AS status_code
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")),

    // ---- Cast (ref cast.rs; truncation via floor on both sides because
    // non-ANSI Spark truncates double→int while DuckDB rounds) ----
    QueryDef(
      "op_cast",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .filter($"o_orderkey" < 200)
          .select(
            $"o_orderkey".cast("string").as("key_str"),
            $"o_totalprice".cast("string").as("price_str"),
            floor($"o_totalprice").cast("long").as("price_floor"),
            $"o_orderdate".cast("date").as("order_date"),
            $"o_orderkey".cast("double").as("key_dbl"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(o_totalprice AS VARCHAR) AS price_str,
        CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(o_orderkey AS DOUBLE) AS key_dbl
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""")),

    // ---- NULL semantics: Kleene AND/OR, IS [NOT] NULL, null-safe IN /
    // NOT IN (ref binary.rs and_kleene/or_kleene, is_null.rs,
    // planner rewrites sql.rs:1060-1099) ----
    QueryDef(
      "op_null_semantics",
      (s, _) => {
        import s.implicits._
        nullTable(s).select(
          $"id",
          ($"b" && ($"v" > 20)).as("and_k"),
          ($"b" || ($"v" > 20)).as("or_k"),
          (!$"b").as("not_b"),
          $"v".isNull.as("v_null"),
          $"v".isNotNull.as("v_not_null"),
          $"v".isin(10, 30).as("in_list"),
          (!$"v".isin(10, 30)).as("not_in_list"))
          .orderBy($"id")
      },
      Some(s"""SELECT id,
        b AND (v > 20) AS and_k,
        b OR (v > 20) AS or_k,
        NOT b AS not_b,
        v IS NULL AS v_null,
        v IS NOT NULL AS v_not_null,
        v IN (10, 30) AS in_list,
        v NOT IN (10, 30) AS not_in_list
        FROM $nullTableSql ORDER BY id""")),

    // ---- Subqueries (ref scalar_subquery_to_join.rs,
    // decorrelate_predicate_subquery.rs; IN-subquery is beyond reference —
    // it panics there, sql.rs:1142) ----
    QueryDef(
      "op_scalar_subquery",
      (s, dir) => {
        import s.implicits._
        val avgPrice = t(s, dir, "orders")
          .agg((sum(m($"o_totalprice")).cast("double") / count(lit(1))).as("avg_price"))
        t(s, dir, "orders")
          .crossJoin(broadcast(avgPrice))
          .filter($"o_totalprice" > $"avg_price" * 1.5)
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                              FROM orders) * 1.5
        ORDER BY o_orderkey""")),

    QueryDef(
      "op_in_subquery",
      (s, dir) => {
        import s.implicits._
        val asiaNations = t(s, dir, "nation").filter($"n_regionkey" === 2)
          .select($"n_nationkey")
        t(s, dir, "customer")
          .join(broadcast(asiaNations), $"c_nationkey" === $"n_nationkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        ORDER BY c_custkey""")),

    QueryDef(
      "op_not_in_subquery",
      (s, dir) => {
        import s.implicits._
        val asiaNations = t(s, dir, "nation").filter($"n_regionkey" === 2)
          .select($"n_nationkey")
        t(s, dir, "supplier")
          .join(broadcast(asiaNations), $"s_nationkey" === $"n_nationkey", "left_anti")
          .select($"s_suppkey", $"s_name")
          .orderBy($"s_suppkey")
      },
      // Subquery side has no NULLs so NOT IN ≡ anti join here.
      Some("""SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        ORDER BY s_suppkey""")),

    QueryDef(
      "op_exists_correlated",
      (s, dir) => {
        import s.implicits._
        // Correlated EXISTS with an extra correlated inequality →
        // left-semi join with residual condition (ref
        // decorrelate_predicate_subquery.rs:24-152).
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders"),
            $"c_custkey" === $"o_custkey" && $"o_totalprice" > $"c_acctbal" * 10,
            "left_semi")
          .select($"c_custkey", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > c_acctbal * 10)
        ORDER BY c_custkey""")),

    // ---- CTE, reused twice (ref planner sql.rs:938-944 context scoping) ----
    QueryDef(
      "op_cte",
      (s, dir) => {
        import s.implicits._
        val natCount = t(s, dir, "customer")
          .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
        val mx = natCount.agg(max($"n_cust").as("max_cust"))
        natCount.crossJoin(broadcast(mx))
          .filter($"n_cust" === $"max_cust")
          .select($"c_nationkey", $"n_cust")
          .orderBy($"c_nationkey")
      },
      Some("""WITH nat AS (SELECT c_nationkey, count(*) AS n_cust
                           FROM customer GROUP BY c_nationkey)
        SELECT c_nationkey, n_cust FROM nat
        WHERE n_cust = (SELECT max(n_cust) FROM nat)
        ORDER BY c_nationkey""")),

    // ---- HAVING (ref aggregate_plan having rebase, sql.rs:875-924) ----
    QueryDef(
      "op_having",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"), sum(m($"o_totalprice")).as("sp"))
          .filter($"n_orders" >= 5 && $"sp" > 500000)
          .select($"o_custkey", $"n_orders", $"sp".cast("double").as("sum_price"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY o_custkey
        HAVING count(*) >= 5 AND sum(CAST(o_totalprice AS DECIMAL(12,2))) > 500000
        ORDER BY o_custkey""")),

    // ---- Subquery alias / self-join disambiguation (ref TableSchema
    // qualifier metadata, common/table_schema.rs:18-78) ----
    QueryDef(
      "op_self_join_alias",
      (s, dir) => {
        import s.implicits._
        val n1 = t(s, dir, "nation").alias("n1")
        val n2 = t(s, dir, "nation").alias("n2")
        n1.join(n2,
            col("n1.n_regionkey") === col("n2.n_regionkey") &&
              col("n1.n_nationkey") < col("n2.n_nationkey"))
          .select(
            col("n1.n_name").as("nation_a"),
            col("n2.n_name").as("nation_b"),
            col("n1.n_regionkey").as("rk"))
          .orderBy($"nation_a", $"nation_b")
      },
      Some("""SELECT n1.n_name AS nation_a, n2.n_name AS nation_b,
        n1.n_regionkey AS rk
        FROM nation n1 JOIN nation n2
          ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
        ORDER BY nation_a, nation_b""")),

    // ---- EXTRACT (the reference's single scalar builtin, §2.6) ----
    QueryDef(
      "op_extract",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .filter($"event_id" < 50)
          .select(
            $"event_id",
            year($"ts").cast("long").as("y"),
            month($"ts").cast("long").as("mo"),
            dayofmonth($"ts").cast("long").as("d"),
            hour($"ts").cast("long").as("h"),
            minute($"ts").cast("long").as("mi"),
            second($"ts").cast("long").as("sec"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
        extract(year FROM ts) AS y, extract(month FROM ts) AS mo,
        extract(day FROM ts) AS d, extract(hour FROM ts) AS h,
        extract(minute FROM ts) AS mi, extract(second FROM ts) AS sec
        FROM events WHERE event_id < 50 ORDER BY event_id""")),

    // ---- Interval arithmetic (ref sql.rs:1146-1229 interval folding +
    // date±interval kernels) ----
    QueryDef(
      "op_interval_arith",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .filter($"o_orderkey" < 100)
          .select(
            $"o_orderkey",
            ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("plus_30d"),
            ($"o_orderdate" - expr("INTERVAL 12 HOURS")).as("minus_12h"),
            ($"o_orderdate" + expr("INTERVAL 2 MONTHS")).as("plus_2mo"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        o_orderdate + INTERVAL 30 DAY AS plus_30d,
        o_orderdate - INTERVAL 12 HOUR AS minus_12h,
        o_orderdate + INTERVAL 2 MONTH AS plus_2mo
        FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""")),

    // ---- Set operations (beyond reference: parser has no UNION/INTERSECT/
    // EXCEPT at all, SURVEY §2.7) ----
    QueryDef(
      "op_union_all",
      (s, dir) => {
        import s.implicits._
        val hi = t(s, dir, "supplier").filter($"s_acctbal" > 9000)
          .select($"s_name".as("name"), lit("supplier").as("kind"))
        val lo = t(s, dir, "customer").filter($"c_acctbal" > 9900)
          .select($"c_name".as("name"), lit("customer").as("kind"))
        hi.unionAll(lo).orderBy($"kind", $"name")
      },
      Some("""SELECT s_name AS name, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000
        UNION ALL
        SELECT c_name AS name, 'customer' AS kind FROM customer WHERE c_acctbal > 9900
        ORDER BY kind, name""")),

    QueryDef(
      "op_union_distinct",
      (s, dir) => {
        import s.implicits._
        val a = t(s, dir, "nation").select($"n_regionkey".as("k"))
        val b = t(s, dir, "region").select($"r_regionkey".as("k"))
        a.union(b).distinct().orderBy($"k")
      },
      Some("""SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region
        ORDER BY k""")),

    QueryDef(
      "op_intersect_except",
      (s, dir) => {
        import s.implicits._
        val custNations = t(s, dir, "customer").select($"c_nationkey".as("k")).distinct()
        val suppNations = t(s, dir, "supplier").select($"s_nationkey".as("k")).distinct()
        val both = custNations.intersect(suppNations).select($"k", lit("both").as("src"))
        val custOnly = custNations.except(suppNations).select($"k", lit("cust_only").as("src"))
        both.unionAll(custOnly).orderBy($"src", $"k")
      },
      Some("""SELECT k, 'both' AS src FROM
          (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier)
        UNION ALL
        SELECT k, 'cust_only' AS src FROM
          (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier)
        ORDER BY src, k""")),

    QueryDef(
      "op_intersect_except_all",
      (s, dir) => {
        import s.implicits._
        // bag semantics: duplicates preserved/subtracted by multiplicity
        val a = t(s, dir, "orders").filter($"o_orderkey" < 3000)
          .select($"o_orderpriority".as("p"))
        val b = t(s, dir, "orders").filter($"o_orderkey" >= 1500 && $"o_orderkey" < 4500)
          .select($"o_orderpriority".as("p"))
        val inter = a.intersectAll(b).groupBy($"p").agg(count(lit(1)).as("n_inter"))
        val exc = a.exceptAll(b).groupBy($"p").agg(count(lit(1)).as("n_except"))
        inter.join(exc, Seq("p"), "full")
          .select($"p", coalesce($"n_inter", lit(0L)).as("n_inter"),
            coalesce($"n_except", lit(0L)).as("n_except"))
          .orderBy($"p")
      },
      Some("""WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey < 3000),
          b AS (SELECT o_orderpriority AS p FROM orders
                WHERE o_orderkey >= 1500 AND o_orderkey < 4500),
          i AS (SELECT p, count(*) AS n_inter FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
                GROUP BY p),
          e AS (SELECT p, count(*) AS n_except FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)
                GROUP BY p)
        SELECT coalesce(i.p, e.p) AS p, coalesce(n_inter, 0) AS n_inter,
               coalesce(n_except, 0) AS n_except
        FROM i FULL JOIN e ON i.p = e.p ORDER BY p""")),

    // ---- range() table-generating function (numeric spine without
    // recursion; planned as a parallel Range scan, not a driver loop) ----
    QueryDef(
      "op_range_tvf",
      (s, dir) => {
        s.sql("""SELECT id, id * id AS sq FROM range(0, 20, 3) ORDER BY id""")
      },
      Some("""SELECT generate_series AS id, generate_series * generate_series AS sq
        FROM generate_series(0, 19, 3) ORDER BY id""")),

    // ---- recursive CTE (beyond reference): generate a dense integer spine
    // and left-join facts onto it — the gap-filling shape time-series
    // reports need (missing buckets appear with count 0) ----
    QueryDef(
      "op_recursive_cte",
      (s, dir) => {
        t(s, dir, "part").createOrReplaceTempView("op_rec_part")
        s.sql("""WITH RECURSIVE sizes(sz) AS (
            SELECT 1 UNION ALL SELECT sz + 1 FROM sizes WHERE sz < 50)
          SELECT sz, count(p_partkey) AS n_parts
          FROM sizes LEFT JOIN op_rec_part ON p_size = sz
          GROUP BY sz ORDER BY sz""")
      },
      Some("""WITH RECURSIVE sizes(sz) AS (
          SELECT 1 UNION ALL SELECT sz + 1 FROM sizes WHERE sz < 50)
        SELECT sz, count(p_partkey) AS n_parts
        FROM sizes LEFT JOIN part ON p_size = sz
        GROUP BY sz ORDER BY sz""")),

    // ---- LATERAL correlated subquery in FROM (beyond reference) ----
    QueryDef(
      "op_lateral_join",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "nation").createOrReplaceTempView("op_lat_nation")
        t(s, dir, "supplier").createOrReplaceTempView("op_lat_supplier")
        s.sql("""SELECT n.n_name, x.top_bal, x.n_rich
          FROM op_lat_nation n,
          LATERAL (SELECT max(s_acctbal) AS top_bal,
                          count(CASE WHEN s_acctbal > 5000 THEN 1 END) AS n_rich
                   FROM op_lat_supplier s WHERE s.s_nationkey = n.n_nationkey) x
          ORDER BY n.n_name""")
      },
      Some("""SELECT n.n_name, x.top_bal, x.n_rich
        FROM nation n,
        LATERAL (SELECT max(s_acctbal) AS top_bal,
                        count(CASE WHEN s_acctbal > 5000 THEN 1 END) AS n_rich
                 FROM supplier s WHERE s.s_nationkey = n.n_nationkey) x
        ORDER BY n.n_name""")),

    // ---- Window functions (beyond reference: no window syntax at all,
    // SURVEY §2.7; decimal-cast running sums keep the frame aggregation
    // order-independent for the oracle) ----
    QueryDef(
      "op_window_rank",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey")
        t(s, dir, "supplier")
          .select(
            $"s_nationkey", $"s_suppkey", $"s_acctbal",
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"))
          .filter($"rn" <= 3)
          .orderBy($"s_nationkey", $"rn")
      },
      Some("""SELECT * FROM (
          SELECT s_nationkey, s_suppkey, s_acctbal,
            row_number() OVER w AS rn, rank() OVER w AS rnk
          FROM supplier
          WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey))
        WHERE rn <= 3 ORDER BY s_nationkey, rn""")),

    QueryDef(
      "op_window_running_sum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter($"o_custkey" < 20)
          .select(
            $"o_custkey", $"o_orderkey",
            sum(m($"o_totalprice")).over(w).cast("double").as("running_total"),
            lag($"o_orderkey", 1).over(
              Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey"))
              .as("prev_order"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        lag(o_orderkey, 1) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order
        FROM orders WHERE o_custkey < 20
        ORDER BY o_custkey, o_orderkey""")),

    // ---- PIVOT (explicit value list, one aggregate → column names are
    // exactly the pivot values on both engines; Spark rewrites to
    // conditional aggregation internally, which is precisely the oracle's
    // FILTER form — one hash aggregate, no extra shuffle) ----
    QueryDef(
      "op_pivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
        count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
        count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- UNPIVOT / melt (the inverse direction): wide numeric columns to
    // (metric, value) rows via Dataset.unpivot — a per-row expansion, no
    // shuffle; oracle is the portable UNION ALL form ----
    QueryDef(
      "op_unpivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_orderkey" < 100)
          .select($"l_orderkey", $"l_linenumber",
            $"l_quantity".cast("double").as("l_quantity"),
            $"l_extendedprice".cast("double").as("l_extendedprice"),
            $"l_discount".cast("double").as("l_discount"),
            $"l_tax".cast("double").as("l_tax"))
          .unpivot(
            Array($"l_orderkey", $"l_linenumber"),
            Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
            "metric", "value")
          .orderBy($"l_orderkey", $"l_linenumber", $"metric")
      },
      Some("""WITH src AS (
          SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 100)
        SELECT l_orderkey, l_linenumber, metric, value FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
                 CAST(l_quantity AS DOUBLE) AS value FROM src
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                 CAST(l_extendedprice AS DOUBLE) FROM src
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount',
                 CAST(l_discount AS DOUBLE) FROM src
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax',
                 CAST(l_tax AS DOUBLE) FROM src)
        ORDER BY l_orderkey, l_linenumber, metric""")),

    // ---- Beyond reference: deterministic TABLESAMPLE. The front door
    // rewrites `t TABLESAMPLE (p PERCENT) REPEATABLE (s)` to a content-keyed
    // md5-uniform filter — the sample is a pure function of row bytes + seed
    // (identical on any engine / partitioning / cluster size, stable under
    // appends), unlike Spark's native per-split RNG sampler. The oracle runs
    // the identical md5 arithmetic in DuckDB. ----
    QueryDef(
      "op_tablesample",
      (s, dir) => {
        val g = new graft.GraftSession(s)
        graft.sources.Tables.register(s, dir, Seq("documents"))
        g.sql("""SELECT lang, count(*) AS n_docs,
            sum(n_chars) AS total_chars
          FROM documents TABLESAMPLE (10 PERCENT) REPEATABLE (42)
          GROUP BY lang ORDER BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM (
          SELECT * FROM documents
          WHERE (CAST('0x' || substring(md5(concat_ws('|', 'smp42',
                   CAST(doc_id AS VARCHAR), text, lang, source,
                   CAST(n_chars AS VARCHAR))), 1, 8) AS UBIGINT) + 0.5)
                / 4294967296.0 < 10 / 100.0)
        GROUP BY lang ORDER BY lang""")),

    // ---- Beyond reference: UNION by column NAME (the DuckDB-popularized
    // schema-evolution union): mismatched column orders align by name and
    // columns missing on one side null-fill — the multi-vintage parquet
    // concatenation every long-lived corpus needs. Dataset.unionByName
    // (allowMissingColumns) vs DuckDB's native UNION ALL BY NAME. ----
    QueryDef(
      "op_union_by_name",
      (s, dir) => {
        import s.implicits._
        val v1 = t(s, dir, "documents").filter($"doc_id" < 50)
          .select($"doc_id", $"lang", $"n_chars")
        val v2 = t(s, dir, "documents")
          .filter($"doc_id" >= 50 && $"doc_id" < 100)
          .select($"source", $"doc_id", $"lang") // reordered + evolved schema
        v1.unionByName(v2, allowMissingColumns = true)
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars, source FROM (
          SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 50
          UNION ALL BY NAME
          SELECT source, doc_id, lang FROM documents
          WHERE doc_id >= 50 AND doc_id < 100)
        ORDER BY doc_id""")),

    // ---- Beyond reference: join strategy hints. The result is hint-
    // invariant (oracle = the plain join); what the hint buys is PLAN
    // control — the BROADCAST side ships to every executor instead of
    // shuffling both inputs (PlanSpec asserts BroadcastHashJoin, and the
    // MERGE-hinted twin plans SortMergeJoin). ----
    QueryDef(
      "op_join_hint",
      (s, dir) => {
        graft.sources.Tables.register(s, dir, Seq("customer", "nation"))
        s.sql("""SELECT /*+ BROADCAST(nation) */ n_name,
            count(*) AS n_customers
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""")
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""))
  )
}
