package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in `graft.queries.*` modules; this object only wires
  * the registry to the driver's Verify/Bench entry points.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5 analog: 6-table join + group-agg — exercises scan, filter
    * pushdown, broadcast + shuffle joins, hash aggregation, sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q5_local_supplier")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql

  /** For each oracle-less key, why no single SQL statement reproduces it
    * bit-for-bit + which named ScalaTest pins correctness instead. */
  def noOracleReasons: Map[String, String] = Registry.noOracleReasons
}
