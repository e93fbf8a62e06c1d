package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Batch/stream parity: the streaming tumbling-window aggregation over the
  * events data must equal the batch form once the stream is drained. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming tumbling window counts equal batch") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"ts", $"event_type")
    // stage a µs-timestamp copy (the raw fixture is ns, which the streaming
    // parquet source rejects the same way batch does)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = StreamingOps.tumblingCounts(spark, events.schema, dir, "1 hour", "2 hours")
    val got = StreamingOps.runToCompletion(spark, stream, "stream_tumbling")
      .select($"window_start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = EventOps.tumbling(Tables.load(spark, TestSpark.sfDir, "events"), "1 hour")
      .select($"window_start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }
}
