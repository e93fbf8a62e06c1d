package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the event analytics (SURVEY.md §2.8: the
  * reference has no streaming at all — this is extension surface). The same
  * `window()` aggregation expressions as [[graft.ops.EventOps]] run over an
  * unbounded source with watermarked state eviction; at scale the parquet
  * directory source becomes Kafka/queue ingestion with identical plan shape.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts over a parquet directory source. */
  def tumblingCounts(
      spark: SparkSession,
      schema: StructType,
      path: String,
      width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(path)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Run a streaming query to completion against the (finite) source and
    * return the materialized result from the memory sink. Used by tests to
    * prove batch/stream parity. */
  def runToCompletion(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
