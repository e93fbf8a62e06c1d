package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table. Batch forms here (the
  * driver gate runs batch); the same `window()` expressions run unchanged
  * under Structured Streaming with `withWatermark` (see
  * [[graft.streaming.StreamingOps]] and its spec).
  */
object EventOps {

  private val money = DecimalType(12, 2)

  /** Tumbling-window aggregate: epoch-aligned windows of `width`. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(money)).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Sliding-window aggregate (width, slide). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Gap-based sessionization per user: a new session starts when the gap
    * from the previous event exceeds `gapMinutes`. Pure window functions —
    * one shuffle on user_id, then linear per-partition passes. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    val prevTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(
      prevTs.isNull ||
        (unix_timestamp(col("ts")) - unix_timestamp(prevTs)) > gapSec, 1L).otherwise(0L)
    events
      .withColumn("session_seq", sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(money)).cast("double").as("session_value"))
  }
}
