package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sink coverage: every query WRITES a slice of a table through a format
  * (parquet / partitioned parquet / CSV / JSON), reads it back, and returns
  * the read-back rows — so the driver's DuckDB hash-compare against the
  * ORIGINAL table proves the round trip lossless end-to-end (writer +
  * reader), not just "a file appeared".
  *
  * The reference parses COPY TO but cannot execute it
  * (`qurious/src/planner/sql.rs:315-321` `todo!()`); the front-door
  * statement form lives in [[graft.GraftSession]] `copyTo` — these queries
  * exercise the same writers via the DataFrame API.
  *
  * Writes go to the local tmpdir (per-query subdir, overwrite mode, so
  * re-runs are idempotent). Output is a directory of part files — the
  * cluster-parallel layout; partitioned parquet adds Hive-style
  * subdirectories, the layout partition pruning needs at 100 TB.
  */
object Sinks extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def out(dir: String, name: String): String =
    Paths.get(sys.props("java.io.tmpdir"), "graft_sinks",
      dir.replaceAll("[^A-Za-z0-9.]", "_"), name).toString

  def defs: Seq[QueryDef] = Seq(
    // ---- plain parquet round trip ----
    QueryDef(
      "snk_parquet_roundtrip",
      (s, dir) => {
        import s.implicits._
        val src = t(s, dir, "orders").filter($"o_orderkey" < 2000)
        val path = out(dir, "orders_parquet")
        src.write.mode("overwrite").parquet(path)
        s.read.parquet(path)
          .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
            $"o_totalprice", $"o_orderdate", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // ---- ORC round trip (the other columnar format Spark bundles —
    // decimal/date/string fidelity through the ORC writer+reader; the
    // oracle sees only the re-read values, which must equal the source) ----
    QueryDef(
      "snk_orc_roundtrip",
      (s, dir) => {
        import s.implicits._
        val src = t(s, dir, "orders").filter($"o_orderkey" < 2000)
        val path = out(dir, "orders_orc")
        src.write.mode("overwrite").orc(path)
        s.read.orc(path)
          .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
            $"o_totalprice", $"o_orderdate", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // ---- Hive-partitioned parquet: the partition column round-trips
    // through directory names and the reader prunes on it ----
    QueryDef(
      "snk_parquet_partitioned",
      (s, dir) => {
        import s.implicits._
        val src = t(s, dir, "orders").filter($"o_orderkey" < 2000)
        val path = out(dir, "orders_by_priority")
        src.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
        s.read.parquet(path)
          // partition pruning: only two of five priority directories read
          .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderkey < 2000 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        ORDER BY o_orderkey""")),

    // ---- Avro round trip (the interchange format Kafka/schema-registry
    // pipelines speak; Spark 4 has the avro runtime but no spark-avro
    // module, so writer AND reader are graft's own container-level
    // implementations — the oracle against the source table proves
    // both lossless, including the timestamp-micros logical type) ----
    QueryDef(
      "snk_avro_roundtrip",
      (s, dir) => {
        import s.implicits._
        val src = t(s, dir, "orders").filter($"o_orderkey" < 2000)
        val path = out(dir, "orders_avro")
        graft.sources.AvroOps.writeAvro(src, path)
        graft.sources.AvroOps.readAvro(s, path)
          .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
            $"o_totalprice", $"o_orderdate", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // ---- CSV round trip (schema-preserving re-read) ----
    QueryDef(
      "snk_csv_roundtrip",
      (s, dir) => {
        import s.implicits._
        val src = t(s, dir, "supplier")
        val path = out(dir, "supplier_csv")
        src.write.mode("overwrite")
          .option("header", "true").option("delimiter", "|")
          .csv(path)
        s.read.schema(src.schema)
          .option("header", "true").option("delimiter", "|")
          .csv(path)
          .select($"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal")
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier ORDER BY s_suppkey""")),

    // ---- JSON (NDJSON) round trip incl. timestamp fidelity ----
    QueryDef(
      "snk_json_roundtrip",
      (s, dir) => {
        import s.implicits._
        val src = t(s, dir, "orders").filter($"o_orderkey" < 1000)
        val path = out(dir, "orders_json")
        src.write.mode("overwrite").json(path)
        s.read.schema(src.schema).json(path)
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""))
  )
}
