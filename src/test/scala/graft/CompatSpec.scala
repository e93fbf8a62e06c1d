package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-semantics parity (SURVEY.md §1.3) + the remaining session
  * surface: UDF registration, CTE/wildcard SQL through the front door,
  * analyzer error shapes the reference's slt corpus checks. */
class CompatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stable sort keeps input order for equal keys") {
    import spark.implicits._
    val df = Seq(("a", 1), ("b", 1), ("c", 1), ("d", 0)).toDF("tag", "k")
      .coalesce(1) // fixed input order
    val got = Compat.stableSort(df, $"k").collect().map(_.getString(0)).toSeq
    assert(got == Seq("d", "a", "b", "c"))
  }

  test("reference null ordering: nulls first under DESC too") {
    import spark.implicits._
    val df = Seq(Some(2), None, Some(1)).toDF("v")
    val got = df.orderBy(Compat.refDesc($"v")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got == Seq(None, Some(2), Some(1)))
  }

  test("decimal division returns double (reference coercion)") {
    import spark.implicits._
    val df = Seq((BigDecimal("7.50"), BigDecimal("2.00"))).toDF("a", "b")
    val out = df.select(Compat.refDiv($"a", $"b").as("q"))
    assert(out.schema.head.dataType.typeName == "double")
    assert(out.collect().head.getDouble(0) == 3.75)
  }

  test("COUNT(*) output naming parity") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x").agg(Compat.countStar())
    assert(df.columns.toSeq == Seq("COUNT(*)"))
    assert(df.collect().head.getLong(0) == 3L)
  }

  test("automatic aggregate output naming (no manual aliases)") {
    val g = new GraftSession(spark)
    g.sql("DROP TABLE IF EXISTS t_cmp0")
    g.sql("CREATE TABLE t_cmp0 (v1 INT, v3 DOUBLE)")
    g.sql("INSERT INTO t_cmp0 VALUES (1, 2.0), (2, 3.0)")
    // COUNT(*) survives the count(1) rewrite
    // (reference aggregate.rs:137-160); coercion casts and Spark's extra
    // parens never leak into names (fmt_expr_for_name, aggregate.rs:17-54)
    assert(g.sql("SELECT count(*) FROM t_cmp0").columns.toSeq == Seq("COUNT(*)"))
    assert(g.sql("SELECT sum(v1) FROM t_cmp0").columns.toSeq == Seq("SUM(v1)"))
    assert(g.sql("SELECT sum(v1 * v3) FROM t_cmp0").columns.toSeq == Seq("SUM(v1 * v3)"))
    assert(g.sql("SELECT max(v1), min(v1) FROM t_cmp0").columns.toSeq ==
      Seq("MAX(v1)", "MIN(v1)"))
    // user aliases pass through untouched
    assert(g.sql("SELECT count(*) AS total FROM t_cmp0").columns.toSeq == Seq("total"))
    g.sql("DROP TABLE t_cmp0")
  }

  test("UDF registration surface (reference UserDefinedFunction trait)") {
    val g = new GraftSession(spark)
    g.registerUdf[String, Int]("str_len2", (s: String) => s.length * 2)
    val r = g.sql("SELECT str_len2('abc') AS v").collect().head
    assert(r.getInt(0) == 6)
  }

  test("CTE and qualified wildcard through the SQL front door") {
    val g = new GraftSession(spark)
    g.sql("DROP TABLE IF EXISTS t_cmp1")
    g.sql("CREATE TABLE t_cmp1 (a INT, b STRING)")
    g.sql("INSERT INTO t_cmp1 VALUES (1, 'x'), (2, 'y')")
    val r = g.sql(
      """WITH big AS (SELECT * FROM t_cmp1 WHERE a > 1)
         SELECT big.* FROM big ORDER BY a""").collect()
    assert(r.length == 1 && r.head.getString(1) == "y")
  }

  test("ungrouped column is an analysis error (reference group_by.slt)") {
    val g = new GraftSession(spark)
    g.sql("DROP TABLE IF EXISTS t_cmp2")
    g.sql("CREATE TABLE t_cmp2 (v1 INT, v2 INT)")
    assertThrows[org.apache.spark.sql.AnalysisException](
      g.sql("SELECT v1, sum(v2) FROM t_cmp2 GROUP BY v2").collect())
  }

  test("empty-string and NULL survive the surface distinctly") {
    val g = new GraftSession(spark)
    val r = g.sql("SELECT '' AS empty, CAST(NULL AS STRING) AS n").collect().head
    assert(r.getString(0) == "" && r.isNullAt(1))
  }
}
