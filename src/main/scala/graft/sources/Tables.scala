package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader/registrar for the driver-generated parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Mirrors the reference's catalog bootstrap (qurious registers tables into
  * `qurious.public` via `ExecuteSession::register_table`,
  * reference `qurious/src/execution/session.rs:106-115`) — here a table is a
  * parquet-backed DataFrame registered as a temp view, so Catalyst gets
  * predicate pushdown + column pruning into the scan for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Some testdata generations store ts as parquet TIMESTAMP(NANOS),
      // which the Spark 4 vectorized reader rejects outright; others store
      // native TIMESTAMP(MICROS). Probe the footer schema: when ts lands as
      // an integral (nanosAsLong), floor-convert to the engine's native
      // microsecond timestamps (driver data is µs-grained, so lossless);
      // when it is already a timestamp, pass it through untouched. Oracles
      // over events use CAST(ts AS TIMESTAMP) for the same µs view.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path(dir, name))
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Sessions pin spark.sql.session.timeZone=UTC, so NTZ→TIMESTAMP is
          // a lossless reinterpretation; the instant-typed column is what
          // unix_millis(), streaming watermarks, and Row.getTimestamp need.
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast(
              org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(path(dir, name))

  /** Register `names` (default: all) as temp views for `spark.sql`. Reading
    * parquet lazily builds only the plan; nothing materializes until an
    * action, so re-registration per query is cheap.
    */
  def register(spark: SparkSession, dir: String, names: Seq[String] = all): Unit =
    names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
