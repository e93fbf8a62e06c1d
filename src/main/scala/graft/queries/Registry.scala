package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame build plus (optionally) the
  * equivalent DuckDB SQL oracle run by the driver on the same parquet tables.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *   - every aggregate/computed column is aliased identically on both sides;
  *   - double aggregates are rounded (sum-order across 32 partitions is
  *     nondeterministic in the last ulps, so raw doubles never hash-match);
  *   - every query ends in a total ORDER BY so row order is deterministic.
  */
/** One verifiable query. `oracle = None` entries MUST carry a
  * [[noOracleReason]]: one sentence on why no single SQL statement can
  * reproduce the result bit-for-bit (surfaced to the driver as
  * `no_oracle_reasons.json`), plus the named ScalaTest that pins
  * correctness instead. */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    noOracleReason: Option[String] = None)

trait QueryModule {
  def defs: Seq[QueryDef]
}

object Registry {
  def modules: Seq[QueryModule] = Seq(
    Tpch,
    Tpch2,
    Relational,
    Analytics,
    Nested,
    DdlDml,
    SourcesCatalog,
    Sinks,
    ExtDedup,
    ExtSimilarity,
    ExtQuantize,
    ExtText,
    ExtMultimodal,
    ExtEvents,
    ExtBpe,
    ExtScale,
    Pipeline)

  lazy val queryDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    queryDefs.map(d => d.name -> d.build).toMap

  lazy val oracleSql: Map[String, String] =
    queryDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Why each oracle-less query has no DuckDB oracle (driver-surfaced). */
  lazy val noOracleReasons: Map[String, String] =
    queryDefs.filter(_.oracle.isEmpty)
      .flatMap(d => d.noOracleReason.map(d.name -> _)).toMap
}
