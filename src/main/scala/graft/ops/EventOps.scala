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

  /** Per-user RUNNING-moments anomaly flags: event e is anomalous when its
    * value is more than `z` running standard deviations from the mean of
    * the user's ≥ `minN` PRIOR events (ordered by ts, event_id) — the
    * online z-score every metrics pipeline runs, in its prior-only (no
    * leakage) form.
    *
    * All moments are exact integer cents, so the anomaly inequality
    * multiplies out to pure integer arithmetic —
    * (c·n − s1)² > z²·(n·s2 − s1²) — which is bit-identical on any engine
    * and any window implementation (DuckDB's segment-tree window sums
    * reassociate float additions; integer sums cannot drift). The
    * streaming twin ([[graft.streaming.StreamingOps.anomalyStream]])
    * carries (n, s1, s2) as keyed state and emits the identical flag set.
    *
    * One user-keyed shuffle; running sums are linear per-partition
    * passes. Int64 headroom: the largest term is n·s2 ≤ n²·c², so cents
    * ≤ 10⁶ (values ≤ $10k) are safe to ~30k events per user — beyond
    * that, promote the moment columns to DECIMAL(38,0). */
  def runningAnomalies(events: DataFrame, minN: Int = 5, z: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast(money) * 100).cast("long").as("c"))
      .withColumn("n_pre", count(lit(1)).over(w))
      .withColumn("s1", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("s2", coalesce(sum(col("c") * col("c")).over(w), lit(0L)))
      .filter(col("n_pre") >= minN &&
        (col("c") * col("n_pre") - col("s1")) * (col("c") * col("n_pre") - col("s1")) >
          lit(z.toLong * z) * (col("n_pre") * col("s2") - col("s1") * col("s1")))
      .select(col("user_id"), col("event_id"))
  }
}
