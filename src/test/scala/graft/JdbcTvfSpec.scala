package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** read_jdbc TVF: partitioned scan shape + filter pushdown into the
  * remote SQL (embedded Derby — no network). Value parity with the
  * parquet truth is the registry oracle's job; this pins the SCALE
  * properties the plan must keep. */
class JdbcTvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("read_jdbc: 4-way partitioned scan, filter pushed to the remote") {
    val df = Registry.queries("src_read_jdbc_tvf")(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), plan)
    assert(plan.contains("numPartitions=4"),
      s"partition options must split the scan, not one serialized task:\n$plan")
    val lower = plan.toLowerCase
    assert(lower.contains("pushedfilters") &&
      lower.contains("equalto(n_regionkey,2)"),
      s"the WHERE must reach the remote as a pushed filter:\n$plan")
    // the scan itself runs as 4 tasks over the range tiling — exactly
    // the nation rows with n_regionkey = 2, no dup/drop at tile edges
    assert(df.count() == 5)
  }

  test("read_jdbc: subquery pushdown form reads through '(query) alias'") {
    // populate happened in the registry entry above (same fixture db)
    Registry.queries("src_read_jdbc_tvf")(spark, TestSpark.sfDir).count()
    val g = new GraftSession(spark)
    val db = java.nio.file.Paths.get("target", "fixtures", "jdbc_nation_db")
      .toAbsolutePath
    val out = g.sql(
      s"""SELECT cnt FROM read_jdbc('jdbc:derby:$db',
            '(SELECT COUNT(*) AS cnt FROM nation) t')""").collect()
    assert(out.length == 1 && out(0).get(0).toString == "25",
      s"subquery TVF form must evaluate remotely: ${out.toSeq}")
  }
}
