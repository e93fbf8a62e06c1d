package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Nested-data operators (arrays / maps / explode) and the scalar-function
  * battery (string / date-time) a complete engine needs.
  *
  * The reference's scalar surface is a single builtin (EXTRACT,
  * `qurious/src/functions/mod.rs`) plus a UDF registry; everything here is
  * "beyond reference" surface. All of it stays inside whole-stage codegen
  * (builtin functions only — no UDFs), so per-row cost is a tight generated
  * loop and at 100 TB the work distributes with zero shuffle except where an
  * explode legitimately widens rows.
  *
  * Oracle note: DuckDB's UNNEST/list functions differ in name but match in
  * semantics (split → string_split_regex, transform → list_transform, …);
  * each query aliases both sides identically and ends in a total ORDER BY.
  */
object Nested extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  def defs: Seq[QueryDef] = Seq(
    // ---- explode: one row per token (Generate — narrow, no shuffle) ----
    QueryDef(
      "nx_explode_tokens",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .filter($"doc_id" < 50)
          .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("token"))
          .filter(length($"token") > 0)
          .orderBy($"doc_id", $"token")
      },
      Some("""WITH f AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
          FROM documents WHERE doc_id < 50)
        SELECT doc_id, token FROM f WHERE length(token) > 0
        ORDER BY doc_id, token""")),

    // ---- posexplode: ordinal-preserving flatten ----
    QueryDef(
      "nx_posexplode",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .filter($"doc_id" < 30)
          .select($"doc_id", posexplode(split(lower($"text"), "\\s+")))
          .withColumnRenamed("pos", "pos").withColumnRenamed("col", "token")
          .filter(length($"token") > 0)
          .select($"doc_id", $"pos".cast("int").as("pos"), $"token")
          .orderBy($"doc_id", $"pos")
      },
      Some("""WITH f AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk
          FROM documents WHERE doc_id < 30),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(tk, (x, i) -> {'pos': i - 1, 'tok': x})) AS u
          FROM f)
        SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS token FROM g
        WHERE length(u.tok) > 0
        ORDER BY doc_id, pos""")),

    // ---- array functions: size/contains/sort/distinct/slice over split ----
    QueryDef(
      "nx_array_funcs",
      (s, dir) => {
        import s.implicits._
        val toks = split(lower(trim($"text")), "\\s+")
        t(s, dir, "documents")
          .filter($"doc_id" < 100)
          .select(
            $"doc_id",
            size(toks).cast("int").as("n_tokens"),
            array_contains(toks, "the").as("has_the"),
            size(array_distinct(toks)).cast("int").as("n_uniq"),
            concat_ws(" ", slice(sort_array(array_distinct(toks)), 1, 3)).as("first3_sorted"))
          .orderBy($"doc_id")
      },
      Some("""WITH f AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents WHERE doc_id < 100)
        SELECT doc_id,
          CAST(len(tk) AS INT) AS n_tokens,
          list_contains(tk, 'the') AS has_the,
          CAST(len(list_distinct(tk)) AS INT) AS n_uniq,
          array_to_string(list_sort(list_distinct(tk))[1:3], ' ') AS first3_sorted
        FROM f ORDER BY doc_id""")),

    // ---- higher-order functions: transform / filter / aggregate ----
    QueryDef(
      "nx_array_hof",
      (s, dir) => {
        import s.implicits._
        val toks = split(lower(trim($"text")), "\\s+")
        t(s, dir, "documents")
          .filter($"doc_id" < 100)
          .select(
            $"doc_id",
            aggregate(transform(toks, w => length(w)), lit(0),
              (acc, x) => acc + x).cast("bigint").as("total_chars"),
            size(filter(toks, w => length(w) > 4)).cast("int").as("n_long"),
            exists(toks, w => w.rlike("^[0-9]+$")).as("has_number"))
          .orderBy($"doc_id")
      },
      Some("""WITH f AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents WHERE doc_id < 100)
        SELECT doc_id,
          CAST(list_sum(list_transform(tk, w -> length(w))) AS BIGINT) AS total_chars,
          CAST(len(list_filter(tk, w -> length(w) > 4)) AS INT) AS n_long,
          len(list_filter(tk, w -> regexp_matches(w, '^[0-9]+$'))) > 0 AS has_number
        FROM f ORDER BY doc_id""")),

    // ---- semi-structured: JSON props → typed map + lookups ----
    QueryDef(
      "nx_map_json",
      (s, dir) => {
        import s.implicits._
        val mp = from_json($"props", lit("map<string,bigint>"))
        t(s, dir, "events")
          .filter($"event_id" < 500)
          .select($"event_id", mp.as("m"), $"props")
          .select(
            $"event_id",
            size(map_keys($"m")).cast("int").as("n_keys"),
            element_at($"m", "k").as("k_val"),
            get_json_object($"props", "$.k").cast("bigint").as("k_json"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
          CAST(len(json_keys(props)) AS INT) AS n_keys,
          CAST(props->>'k' AS BIGINT) AS k_val,
          CAST(props->>'k' AS BIGINT) AS k_json
        FROM events WHERE event_id < 500 ORDER BY event_id""")),

    // ---- string battery ----
    QueryDef(
      "nx_string_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .filter($"p_partkey" < 300)
          .select(
            $"p_partkey",
            upper($"p_name").as("up"),
            lower($"p_brand").as("lo"),
            substring($"p_name", 1, 5).as("sub5"),
            length($"p_name").cast("int").as("len"),
            trim(lit("  pad  ")).as("trimmed"),
            lpad($"p_brand", 12, "*").as("padded"),
            regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
            regexp_extract($"p_type", "([A-Z]+)", 1).as("first_word"),
            concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
            translate($"p_brand", "#", "-").as("translated"),
            ($"p_name".startsWith("a")).as("starts_a"),
            ($"p_type".endsWith("D")).as("ends_d"),
            instr($"p_name", "e").cast("int").as("first_e"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
        upper(p_name) AS up,
        lower(p_brand) AS lo,
        substring(p_name, 1, 5) AS sub5,
        CAST(length(p_name) AS INT) AS len,
        trim('  pad  ') AS trimmed,
        lpad(p_brand, 12, '*') AS padded,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        coalesce(regexp_extract(p_type, '([A-Z]+)', 1), '') AS first_word,
        p_brand || '/' || p_type AS brand_type,
        replace(p_brand, '#', '-') AS translated,
        starts_with(p_name, 'a') AS starts_a,
        ends_with(p_type, 'D') AS ends_d,
        CAST(strpos(p_name, 'e') AS INT) AS first_e
        FROM part WHERE p_partkey < 300 ORDER BY p_partkey""")),

    // ---- date/time battery ----
    QueryDef(
      "nx_date_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .filter($"o_orderkey" < 500)
          .select(
            $"o_orderkey",
            date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
            year($"o_orderdate").cast("int").as("yr"),
            quarter($"o_orderdate").cast("int").as("qtr"),
            month($"o_orderdate").cast("int").as("mo"),
            dayofmonth($"o_orderdate").cast("int").as("dom"),
            dayofweek($"o_orderdate").cast("int").as("dow"),
            add_months($"o_orderdate".cast("date"), 3).as("plus3m"),
            last_day($"o_orderdate").as("month_end"),
            datediff(lit(java.sql.Date.valueOf("1996-01-01")),
              $"o_orderdate".cast("date")).cast("int").as("days_to_1996"))
          .orderBy($"o_orderkey")
      },
      // DuckDB dayofweek: 0=Sunday; Spark: 1=Sunday → +1 on oracle side.
      Some("""SELECT o_orderkey,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS INT) AS days_to_1996
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")),

    // ---- conditional / null-handling scalars ----
    QueryDef(
      "nx_null_scalars",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .filter($"c_custkey" < 300)
          .select(
            $"c_custkey",
            coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(b)")).as("seg_or_b"),
            nvl2(nullif($"c_mktsegment", lit("AUTOMOBILE")), lit("other"), lit("auto")).as("auto_flag"),
            greatest($"c_acctbal", lit(0.0)).as("bal_floor"),
            least($"c_acctbal", lit(1000.0)).as("bal_cap"),
            isnull(nullif($"c_mktsegment", lit("MACHINERY"))).as("is_machinery"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
        coalesce(nullif(c_mktsegment, 'BUILDING'), '(b)') AS seg_or_b,
        CASE WHEN nullif(c_mktsegment, 'AUTOMOBILE') IS NOT NULL
             THEN 'other' ELSE 'auto' END AS auto_flag,
        greatest(c_acctbal, 0.0) AS bal_floor,
        least(c_acctbal, 1000.0) AS bal_cap,
        nullif(c_mktsegment, 'MACHINERY') IS NULL AS is_machinery
        FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""")),

    // ---- date formatting battery: date_format patterns ↔ DuckDB strftime
    // equivalents, plus epoch seconds (both sessions pinned UTC). Per-row
    // scalars, no shuffle. ----
    QueryDef(
      "nx_date_format",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .filter($"o_orderkey" < 500)
          .select(
            $"o_orderkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("iso"),
            date_format($"o_orderdate", "yyyy-MM").as("ym"),
            date_format($"o_orderdate", "MM/dd/yyyy").as("us"),
            date_format($"o_orderdate", "yyyyMMdd").as("compact"),
            unix_timestamp($"o_orderdate".cast("timestamp")).as("epoch_s"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso,
        strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        strftime(CAST(o_orderdate AS DATE), '%m/%d/%Y') AS us,
        strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS compact,
        CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s
        FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")),

    // ---- string distance + structure functions: levenshtein (the fuzzy
    // key-matching primitive), reverse/repeat/split_part. Per-row codegen'd
    // scalars, no shuffle. ----
    QueryDef(
      "nx_string_distance",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .filter($"c_custkey" < 300)
          .select(
            $"c_custkey",
            levenshtein($"c_name", lit("Customer#000000001")).cast("int").as("lev_c1"),
            levenshtein($"c_mktsegment", lit("BUILDING")).cast("int").as("lev_seg"),
            reverse($"c_mktsegment").as("seg_rev"),
            expr("repeat(substring(c_mktsegment, 1, 2), 3)").as("seg_rep"),
            expr("split_part(c_name, '#', 2)").as("name_num"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
        CAST(levenshtein(c_name, 'Customer#000000001') AS INT) AS lev_c1,
        CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev_seg,
        reverse(c_mktsegment) AS seg_rev,
        repeat(substring(c_mktsegment, 1, 2), 3) AS seg_rep,
        split_part(c_name, '#', 2) AS name_num
        FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""")),

    // ---- math scalar battery: atan2 / log2 / log10 / cbrt / sign /
    // degrees / radians — rounded to 6 (libm last-ulp differences across
    // engines are real; rounded values are exact). ----
    QueryDef(
      "nx_math_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .filter($"c_custkey" < 300 && $"c_acctbal" > 1.0)
          .select(
            $"c_custkey",
            round(atan2($"c_acctbal", $"c_custkey".cast("double")), 6).as("at2"),
            round(log2($"c_acctbal"), 6).as("lg2"),
            round(log10($"c_acctbal"), 6).as("lg10"),
            round(cbrt($"c_acctbal"), 6).as("cbrt_bal"),
            signum($"c_acctbal" - 5000.0).cast("double").as("sgn"),
            round(degrees($"c_acctbal" / 10000.0), 6).as("deg"),
            round(radians($"c_acctbal" / 100.0), 6).as("rad"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
        round(atan2(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS at2,
        round(log2(c_acctbal), 6) AS lg2,
        round(log10(c_acctbal), 6) AS lg10,
        round(cbrt(c_acctbal), 6) AS cbrt_bal,
        CAST(sign(c_acctbal - 5000.0) AS DOUBLE) AS sgn,
        round(degrees(c_acctbal / 10000.0), 6) AS deg,
        round(radians(c_acctbal / 100.0), 6) AS rad
        FROM customer WHERE c_custkey < 300 AND c_acctbal > 1.0
        ORDER BY c_custkey""")),

    // ---- error-safe (try_*) function battery: NULL-on-failure variants a
    // complete ANSI engine needs alongside the strict front door (our
    // session runs ANSI like the reference's safe:false casts — try_* is
    // the per-expression opt-out). Oracle: DuckDB TRY_CAST natively; the
    // zero-divide guard spelled as the equivalent CASE. ----
    QueryDef(
      "nx_try_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .filter($"p_partkey" < 300)
          .select($"p_partkey",
            expr("try_cast(p_name AS INT)").as("name_int"),
            expr("try_cast(cast(p_partkey AS STRING) AS INT)").as("key_int"),
            expr("""try_cast(CASE WHEN p_partkey % 2 = 0
                      THEN '2021-02-30' ELSE '2021-03-05' END AS DATE)""")
              .as("maybe_date"),
            expr("try_divide(cast(p_retailprice AS DOUBLE), " +
              "cast(p_partkey % 3 AS DOUBLE))").as("maybe_div"),
            expr("try_cast(concat('1e', cast(p_partkey % 5 AS STRING)) AS DOUBLE)")
              .as("sci_double"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
          TRY_CAST(p_name AS INT) AS name_int,
          TRY_CAST(CAST(p_partkey AS VARCHAR) AS INT) AS key_int,
          TRY_CAST(CASE WHEN p_partkey % 2 = 0
                   THEN '2021-02-30' ELSE '2021-03-05' END AS DATE)
            AS maybe_date,
          CASE WHEN p_partkey % 3 = 0 THEN NULL
               ELSE CAST(p_retailprice AS DOUBLE) / (p_partkey % 3) END
            AS maybe_div,
          TRY_CAST('1e' || CAST(p_partkey % 5 AS VARCHAR) AS DOUBLE)
            AS sci_double
        FROM part WHERE p_partkey < 300 ORDER BY p_partkey"""))
  )
}
