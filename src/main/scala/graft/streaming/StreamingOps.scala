package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Completed user session emitted by the stateful sessionizer. */
  final case class UserSession(
      user_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  /** Open-session state (public: Catalyst codegen instantiates it; millis
    * instead of Timestamp keeps the state encoder primitive-only). */
  final case class SessionState(n: Long, startMs: Long, lastMs: Long)

  /** Custom streaming state: gap-based sessionization with
    * `flatMapGroupsWithState` — per-user state holds the open session;
    * events extending it update state, a gap beyond `gapMinutes` closes the
    * session and emits it. Event-time timeout evicts idle users' state (the
    * unbounded-state guard that matters at real stream volume). */
  def sessionizeStateful(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int,
      watermark: String = "2 hours"): Dataset[UserSession] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMs = gapMinutes * 60000L

    def fn(
        userId: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      def toTs(ms: Long) = new java.sql.Timestamp(ms)
      val sorted = rows.toSeq.map(_._2.getTime).sorted
      var st = state.getOption.orNull
      val out = Seq.newBuilder[UserSession]
      sorted.foreach { ms =>
        st match {
          case null => st = SessionState(1, ms, ms)
          case s if ms - s.lastMs <= gapMs =>
            st = s.copy(n = s.n + 1, lastMs = ms)
          case s =>
            out += UserSession(userId, s.n, toTs(s.startMs), toTs(s.lastMs))
            st = SessionState(1, ms, ms)
        }
      }
      if (st != null) {
        if (state.hasTimedOut) {
          out += UserSession(userId, st.n, toTs(st.startMs), toTs(st.lastMs))
          state.remove()
        } else {
          state.update(st)
          state.setTimeoutTimestamp(st.lastMs + gapMs)
        }
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

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
