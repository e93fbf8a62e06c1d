package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Open-session state (public: Catalyst codegen instantiates it; epoch
    * micros instead of Timestamp keep the state encoder primitive-only
    * without losing the sub-millisecond precision batch timestamps carry). */
  final case class SessionState(n: Long, startUs: Long, lastUs: Long)

  /** Custom streaming state: gap-based sessionization with
    * `flatMapGroupsWithState` — per-user state holds the open session;
    * events extending it update state, a gap beyond `gapMinutes` closes the
    * session and emits it. Event-time timeout evicts idle users' state (the
    * unbounded-state guard that matters at real stream volume).
    *
    * Gap semantics match [[graft.ops.EventOps.sessionize]] exactly: the gap
    * compares *floor-second* timestamps (batch uses `unix_timestamp`, which
    * truncates sub-second parts), and session extents keep full microsecond
    * precision — so stream and batch are set-equal on the same events. */
  def sessionizeStateful(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int,
      watermark: String = "2 hours"): Dataset[UserSession] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapSec = gapMinutes * 60L

    def fn(
        userId: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      def toUs(t: java.sql.Timestamp): Long =
        t.getTime / 1000 * 1000000L + t.getNanos / 1000
      def toTs(us: Long): java.sql.Timestamp = {
        val t = new java.sql.Timestamp(us / 1000)
        t.setNanos((us % 1000000L).toInt * 1000)
        t
      }
      val sorted = rows.toSeq.map(r => toUs(r._2)).sorted
      var st = state.getOption.orNull
      val out = Seq.newBuilder[UserSession]
      sorted.foreach { us =>
        st match {
          case null => st = SessionState(1, us, us)
          case s if us / 1000000L - s.lastUs / 1000000L <= gapSec =>
            st = s.copy(n = s.n + 1, lastUs = us)
          case s =>
            out += UserSession(userId, s.n, toTs(s.startUs), toTs(s.lastUs))
            st = SessionState(1, us, us)
        }
      }
      if (st != null) {
        if (state.hasTimedOut) {
          out += UserSession(userId, st.n, toTs(st.startUs), toTs(st.lastUs))
          state.remove()
        } else {
          state.update(st)
          // +1s slack: the gap is floor-second, so an event up to a second
          // past lastUs+gap can still extend the session
          state.setTimeoutTimestamp(st.lastUs / 1000 + gapSec * 1000 + 1000)
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

  /** Watermarked streaming deduplication: first event wins per key.
    * `dropDuplicatesWithinWatermark` is the formulation whose state Spark
    * actually EVICTS at the watermark horizon when the event-time column is
    * not part of the dedup key — plain `dropDuplicates("k")` under a
    * watermark keeps every key forever (eviction only triggers when the
    * event-time column is among the keys), which silently grows state
    * without bound on a real stream. Batch twin for parity tests:
    * groupBy(key).agg(min(...)) / row_number()=1. */
  def dedupFirstEvent(
      spark: SparkSession,
      schema: StructType,
      path: String,
      watermark: String = "24 hours"): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(path)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Streaming corpus ingest: the batch `pl_corpus_clean` shape on an
    * unbounded document stream — per-row classify (lang/quality/fingerprint,
    * all codegen'd, shuffle-free) → quality gate → fingerprint dedup whose
    * state is bounded by the watermark horizon. This is how the cleaning
    * pipeline runs CONTINUOUSLY at ingest time instead of as a nightly
    * batch; survivors append to the curated sink. Batch twin for parity:
    * the same classify+filter with row_number()=1 per fingerprint.
    * Dedup state is evicted at the watermark via
    * `dropDuplicatesWithinWatermark` (see [[dedupFirstEvent]]). */
  def corpusCleanStream(
      spark: SparkSession,
      schema: StructType,
      path: String,
      watermark: String = "24 hours"): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(path)
      // spread the micro-batch BEFORE the classify projection: a trigger
      // that admits few (or one) files would otherwise run the whole
      // text_stats/fingerprint pass in as many tasks as files (guide §2.5
      // input skew); the exchange moves (doc_id, text, ts) once per batch
      // and buys full-core classify parallelism regardless of file layout
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("lang_guess", graft.ops.TextOps.langId(col("text")))
      .withColumn("quality", graft.ops.TextOps.qualityScore(col("text")))
      .withColumn("fp", graft.ops.TextOps.fingerprint(col("text")))
      .filter(col("lang_guess") === "en" && col("quality") >= 0.5)
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("source"), col("quality"), col("fp"))

  /** First claimant of an LSH band bucket (state of [[nearDupGateStream]];
    * epoch micros keep the encoder primitive-only). */
  final case class BandClaim(firstUs: Long, firstDoc: Long)

  final case class FrontierClock(nextSeq: Int)

  /** Streaming twin of [[graft.ops.RobotsOps.frontierSchedule]]: a live
    * crawl assigns politeness slots CONTINUOUSLY, so the batch window
    * becomes per-HOST keyed state (the next fetch sequence number) that
    * carries across micro-batches — URLs arriving in later batches
    * continue the host's queue instead of restarting it (spec-proven
    * across two waves). Within a micro-batch, rows order by
    * (ingest_ts, doc_id) — the batch twin's sort — so a single-batch
    * replay is bit-identical to batch. Event-time timeout retires
    * hosts idle past `idleHorizonMillis` (state is the crawl's working
    * set, not its history; a host returning after the horizon starts a
    * fresh politeness window). Input schema: (host, doc_id,
    * crawl_delay, ingest_ts) — the gate's allowed rows. */
  def frontierStream(
      spark: SparkSession, schema: StructType, path: String,
      watermark: String = "1 hour",
      idleHorizonMillis: Long = 24L * 3600 * 1000): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def assign(
        host: String,
        rows: Iterator[(String, Long, Double, java.sql.Timestamp)],
        state: GroupState[FrontierClock])
        : Iterator[(Long, String, Int, Double)] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = rows.toSeq.sortBy(r => (r._4.getTime, r._2))
      var seq = state.getOption.map(_.nextSeq).getOrElse(1)
      val out = sorted.map { case (_, doc, delay, _) =>
        val s = seq
        seq += 1
        (doc, host, s, (s - 1).toDouble * delay)
      }
      if (sorted.nonEmpty) {
        state.update(FrontierClock(seq))
        state.setTimeoutTimestamp(
          sorted.map(_._4.getTime).max + idleHorizonMillis)
      }
      out.iterator
    }
    spark.readStream.schema(schema).parquet(path)
      .withWatermark("ingest_ts", watermark)
      .select(col("host"), col("doc_id"),
        col("crawl_delay").cast("double"), col("ingest_ts"))
      .as[(String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(assign)
      .toDF("doc_id", "host", "fetch_seq", "fetch_offset_s")
  }

  /** Streaming near-duplicate GATE: the unbounded-ingest twin of
    * [[graft.ops.DedupOps.nearDupGateBatch]] — admit a document iff it is
    * the first claimant of EVERY one of its MinHash LSH band buckets
    * within the watermark horizon (a near-dup of an earlier doc shares ≥1
    * band by LSH design and fails that band's claim). Two chained stateful
    * stages, both watermark-bounded:
    *
    *  1. explode to (band, doc, ts) and `flatMapGroupsWithState` keyed by
    *     band key: state is the first-arriving claimant (ties inside a
    *     micro-batch broken by (ts, doc id) — the batch twin's order);
    *     event-time timeout evicts bands idle past the horizon, so state
    *     is |distinct bands seen within horizon|, never corpus-sized.
    *  2. re-watermark and aggregate the per-band claim bits back to doc
    *     grain (append-mode event-time aggregation): `is_new` =
    *     conjunction over the doc's bands.
    *
    * At 100 TB/day both shuffles carry three scalar columns (band key,
    * doc id, bit) — signatures are computed map-side by the codegen'd
    * neutral-minhash kernel and never travel. StreamingSpec proves
    * batch/stream parity on planted near-dups.
    *
    * Requires `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`:
    * Spark's global-watermark check conservatively rejects every
    * flatMapGroupsWithState → aggregation chain because FMGWS *could* emit
    * rows behind the watermark. This one cannot — stage 1 emits each input
    * row at its own unchanged event time, which the same watermark already
    * admitted, so nothing reaches stage 2 late. */
  def nearDupGateStream(
      spark: SparkSession,
      schema: StructType,
      path: String,
      watermark: String = "24 hours",
      horizonMillis: Long = 24L * 3600 * 1000,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def toUs(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    def claim(
        band: String,
        rows: Iterator[(String, Long, java.sql.Timestamp)],
        state: GroupState[BandClaim]): Iterator[(Long, java.sql.Timestamp, Boolean)] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      // first-wins inside the batch by (event time, doc id) — the batch
      // twin's Window order, so a single-batch replay is bit-identical
      val sorted = rows.toSeq.sortBy(r => (toUs(r._3), r._2))
      var st = state.getOption.orNull
      val out = sorted.map { case (_, doc, ts) =>
        if (st == null) { st = BandClaim(toUs(ts), doc); (doc, ts, true) }
        else (doc, ts, st.firstDoc == doc)
      }
      if (st != null) {
        state.update(st)
        val maxMs = sorted.map(r => r._3.getTime).max
        state.setTimeoutTimestamp(maxMs + horizonMillis)
      }
      out.iterator
    }

    val docs = spark.readStream.schema(schema).parquet(path)
      // spread BEFORE the signature projection: shingling + the 64-hash
      // minhash kernel are the map-side cost, and a trigger admitting few
      // files would run them in as many tasks as files (guide §2.5)
      .repartition(spark.sparkContext.defaultParallelism)
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        graft.ops.TextOps.shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("ingest_ts"),
        explode(graft.ops.DedupOps.minhashBandKeys(col("sh"), bands, rowsPerBand))
          .as("band"))
    // column reorder (not a typed map): projections preserve the event-time
    // watermark tag; a .map would strip it and EventTimeTimeout requires it
    val claims = docs
      .select(col("band"), col("doc_id"), col("ingest_ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(claim)
      .toDF("doc_id", "ingest_ts", "claimed")
    claims
      .withWatermark("ingest_ts", watermark)
      .groupBy(col("doc_id"), col("ingest_ts"))
      .agg(min(col("claimed")).as("is_new"))
      .select(col("doc_id"), col("is_new"))
  }

  /** Per-user running moments (state of [[anomalyStream]]; integer cents). */
  final case class MomentState(n: Long, s1: Long, s2: Long)

  /** Streaming twin of [[graft.ops.EventOps.runningAnomalies]]: per-user
    * (n, s1, s2) integer-cent moments as keyed state; each arriving event
    * is flagged against the moments of the events BEFORE it (batch-sorted
    * by (ts, event_id) — the batch twin's window order) and then folded
    * in. The inequality is the same pure-integer form, so stream == batch
    * flag set exactly (StreamingSpec). Event-time timeout evicts users
    * idle past the horizon; emission is immediate (no downstream stateful
    * op, no output-flush dependency on the watermark). */
  def anomalyStream(
      spark: SparkSession,
      schema: StructType,
      path: String,
      watermark: String = "2 hours",
      horizonMillis: Long = 2L * 3600 * 1000,
      minN: Int = 5, z: Int = 3): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def toUs(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000

    def fn(
        user: Long,
        rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
        state: GroupState[MomentState]): Iterator[(Long, Long)] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = rows.toSeq.sortBy(r => (toUs(r._4), r._2))
      var st = state.getOption.getOrElse(MomentState(0L, 0L, 0L))
      val out = Seq.newBuilder[(Long, Long)]
      sorted.foreach { case (_, eid, c, _) =>
        val lhs = c * st.n - st.s1
        if (st.n >= minN &&
            lhs * lhs > z.toLong * z * (st.n * st.s2 - st.s1 * st.s1))
          out += ((user, eid))
        st = MomentState(st.n + 1, st.s1 + c, st.s2 + c * c)
      }
      state.update(st)
      state.setTimeoutTimestamp(sorted.map(_._4.getTime).max + horizonMillis)
      out.result().iterator
    }

    spark.readStream.schema(schema).parquet(path)
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("c"),
        col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF("user_id", "event_id")
  }

  /** Streaming benchmark decontamination: drop any streamed document
    * sharing a token block with the (pre-built) probe Bloom filter. The
    * filter rides the plan as a 16 KiB literal ([[graft.ops.BloomOps]]),
    * so the stage is STATELESS and shuffle-free — no state store, no
    * watermark, works in any output mode, and the per-row cost is pure
    * column arithmetic. Bloom false positives can only over-drop (the
    * conservative direction for decontamination); false negatives are
    * impossible, so no contaminated block ever passes. Batch twin for
    * parity: the identical predicate as a batch filter. */
  def decontaminateStream(
      stream: DataFrame, text: Column, words: Array[Long],
      blockTokens: Int = 8, numHashes: Int = 7): DataFrame = {
    val tk0 = graft.ops.TextOps.tokens(text)
    // split('') yields [""] (size 1, one empty token), never [] — filter
    // empty tokens so a blank doc gets a genuinely empty token list and
    // the empty-doc guard below actually fires (it always survives)
    val tk = filter(tk0, t => t =!= "")
    // sequence(1, 0) DESCENDS in Spark — empty docs get an empty block
    // array explicitly (and therefore always survive)
    val blocks = when(size(tk) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), ceil(size(tk).cast("double") / blockTokens).cast("int")),
        i => concat_ws(" ",
          slice(tk, (i - lit(1)) * lit(blockTokens) + lit(1), lit(blockTokens)))))
    stream.filter(!exists(blocks,
      b => graft.ops.BloomOps.mightContain(b, words, numHashes)))
  }

  /** Stream-stream inner join: each purchase joined to the same user's view
    * events in the preceding hour. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can evict buffered rows
    * once the watermark passes — bounded state, the requirement for a
    * stream-stream join at volume (Spark drops rows older than
    * watermark + range from the join buffers).
    *
    * At 100 TB/day this is the canonical attribution join: both sides
    * shuffle on user_id once; state per key is bounded by the 1-hour range
    * plus watermark slack. */
  def viewToPurchaseJoin(
      spark: SparkSession,
      schema: StructType,
      path: String,
      watermark: String = "2 hours"): DataFrame = {
    val views = spark.readStream.schema(schema).parquet(path)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val purchases = spark.readStream.schema(schema).parquet(path)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("buy_ts"), col("event_id").as("buy_id"),
        col("value").as("buy_value"))
      .withWatermark("buy_ts", watermark)
    purchases.join(
      views,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("buy_ts") &&
        col("view_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("buy_id"), col("buy_ts"), col("buy_value"),
        col("view_id"), col("view_ts"))
  }

  /** Stream-stream LEFT OUTER interval join — the abandoned-view detector
    * as an unbounded job: every view emits, decorated with a purchase from
    * the following hour when one arrives, or with NULLs once the watermark
    * proves none can. The outer side is what inner stream-stream joins
    * cannot express: emission of the ABSENCE of a match, which requires
    * exactly the watermark+interval bound so the engine knows when a
    * view's match window is closed and its state evictable. State per side
    * is bounded by (watermark + interval) of stream time. */
  def viewToPurchaseLeftJoin(
      spark: SparkSession,
      schema: StructType,
      path: String,
      watermark: String = "10 minutes"): DataFrame = {
    val views = spark.readStream.schema(schema).parquet(path)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val purchases = spark.readStream.schema(schema).parquet(path)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("buy_ts"), col("event_id").as("buy_id"))
      .withWatermark("buy_ts", watermark)
    views.join(
      purchases,
      col("v_user_id") === col("user_id") &&
        col("buy_ts") >= col("view_ts") &&
        col("buy_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("v_user_id"), col("view_id"), col("view_ts"),
        col("buy_id"), col("buy_ts"))
  }

  /** Native session-window aggregation (`session_window(ts, gap)`) — the
    * declarative sibling of [[sessionizeStateful]]: Spark merges
    * overlapping per-event windows into gap-separated sessions inside the
    * aggregation operator, with watermark-driven eviction. One user-keyed
    * shuffle; state per key is bounded by open sessions only. The same
    * expression aggregates a BATCH frame identically (StreamingSpec proves
    * parity), which is the migration property: one definition, both
    * execution modes. */
  def sessionWindowCounts(
      df: DataFrame,
      gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(df)(w => df.withWatermark("ts", w))
    src.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  /** Stream-static broadcast enrichment: every streamed event decorated
    * with its user's dimension row. The static side re-resolves per
    * micro-batch (so a dim-table refresh is picked up without restarting
    * the query) and broadcasts — no shuffle of the stream, no state, no
    * watermark: the 100 TB/day "decorate the firehose" join is a map-side
    * hash probe per executor. Inner join drops events without a dimension
    * row (route to a dead-letter sink in production). */
  def enrichWithDim(
      spark: SparkSession,
      schema: StructType,
      path: String,
      dim: DataFrame,
      eventKey: String,
      dimKey: String): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(path)
    stream.join(broadcast(dim), stream(eventKey) === dim(dimKey))
  }

  /** Streaming materialized-view maintenance — the streaming twin of the
    * batch `pl_incremental_agg` refresh: an UPDATE-mode streaming
    * aggregation keeps the per-(user, event_type) rollup in the state
    * store, and each micro-batch emits ONLY the keys that changed, which
    * foreachBatch upserts into the serving store. The raw stream is never
    * re-scanned; per-trigger work is O(batch + changed keys). `store`
    * stands in for the key-value/Delta MERGE target a deployment writes
    * to — the changed-row set is tiny by construction (that is the point
    * of update mode), so the upsert is cheap wherever it lands. State is
    * bounded by the view's own key cardinality — the same bound as the
    * materialized table itself. Money sums stay DECIMAL so replaying in
    * any batch split yields bit-identical state. */
  def maintainAggStream(
      spark: SparkSession,
      events: DataFrame,
      store: scala.collection.concurrent.TrieMap[
        (Long, String), (Long, java.math.BigDecimal, java.sql.Timestamp)],
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val agg = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .as("sum_value"),
        max(col("ts")).as("last_ts"))
    val writer = agg.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          store.put((r.getLong(0), r.getString(1)),
            (r.getLong(2), r.getDecimal(3), r.getTimestamp(4)))
        }
        ()
      }
    // with a checkpoint dir the rollup state (counts/sums per key) and the
    // source offsets survive a stop: a restarted query resumes exactly
    // where it left off instead of recounting from scratch
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  /** STREAMING UPSERT into a merge-on-read gdisk table: each micro-batch
    * key-dedupes and `MERGE INTO`s the target, which on a
    * `'delete.mode'='dv'` table takes the DELTA row-level path — matched
    * rows' pre-images land in deletion-vector sidecars and only the
    * post-images append as new files, so a trickle of CDC corrections
    * against a 100 TB table never rewrites a data file (the nightly
    * OPTIMIZE purges). Replay-safe without an epoch ledger because an
    * ABSOLUTE upsert is idempotent: re-merging a replayed batch matches
    * the rows its first pass inserted/updated and sets them to the same
    * values, and each MERGE is one atomic manifest commit — the end
    * state after any crash/restart equals exactly-once. Within-batch
    * duplicates keep the LAST row per key in `orderCol` order (CDC
    * sequence discipline). */
  def upsertStream(
      spark: SparkSession,
      source: DataFrame,
      targetTable: String,
      keyCols: Seq[String],
      orderCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    require(keyCols.nonEmpty, "upsertStream needs at least one key column")
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.row_number
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc)
        val deduped = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val view = s"__upsert_src_${java.util.UUID.randomUUID.toString.replace('-', '_')}"
        deduped.createOrReplaceTempView(view)
        try {
          val on = keyCols.map(c => s"t.`$c` = s.`$c`").mkString(" AND ")
          val nonKey = deduped.columns.filterNot(keyCols.contains)
          val sets = nonKey.map(c => s"t.`$c` = s.`$c`").mkString(", ")
          val cols = deduped.columns.map(c => s"`$c`").mkString(", ")
          val vals = deduped.columns.map(c => s"s.`$c`").mkString(", ")
          batch.sparkSession.sql(
            s"""MERGE INTO $targetTable t USING $view s ON $on
               WHEN MATCHED THEN UPDATE SET $sets
               WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)""")
        } finally batch.sparkSession.catalog.dropTempView(view)
        ()
      }
      .start()
  }

  /** Rolling 7-day distinct users, streaming form of the batch
    * `an_rolling_distinct_users` query. COUNT(DISTINCT) over a sliding
    * window has no streaming (or distributed) form, so the same
    * day-expansion inversion is used: each event explodes into the 7 daily
    * windows its (user, day) pair covers, `dropDuplicatesWithinWatermark`
    * collapses repeats of (user_id, window-day) — state is one row per
    * user per covered day, evicted as the watermark passes — and a plain
    * watermarked windowed COUNT then IS the rolling distinct. Chained
    * stateful operators (dedup → time-window agg) share the single `wts`
    * watermark. The 8-day delay = 6-day expansion span + 2 days of
    * event lateness; later events than that could double-count a user
    * whose dedup state was already evicted (the exactness bound). */
  def rollingDistinctUsers(
      spark: SparkSession,
      schema: StructType,
      path: String): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(path)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .select(col("user_id"),
        explode(expr(
          """sequence(cast(day AS timestamp),
             cast(date_add(day, 6) AS timestamp), interval 1 day)""")).as("wts"))
      .withWatermark("wts", "8 days")
      .dropDuplicatesWithinWatermark("user_id", "wts")
      .groupBy(window(col("wts"), "1 day").as("w"))
      .agg(count(lit(1)).as("u7"))
      .select(col("w.start").cast("date").as("day"), col("u7"))

  /** Admitted/over-budget decision for one event under the per-user quota. */
  final case class QuotaDecision(event_id: Long, user_id: Long, admitted: Boolean)

  /** Per-user ingest budget gate on the CURRENT-generation stateful API
    * (`transformWithState`, Spark 4) — the arbitrary-state companion to the
    * `flatMapGroupsWithState` sessionizer, on the API that adds composable
    * typed state handles, TTL, and timers. Semantics: spend accumulates in
    * (ts, event_id) order over ALL of a user's events; an event is admitted
    * while the cumulative spend stays ≤ `quotaCents` (the same
    * budget-cutoff rule as the batch length-clip/token-budget ops, so the
    * batch twin is a plain user-partitioned running sum — spec proves
    * equality). State per user is ONE long (cumulative cents); micro-batch
    * input rows are sorted in-handler because arrival order within a batch
    * is not guaranteed. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`; rocksdbjni ships with Spark) —
    * transformWithState state is column-family-based, which the default
    * HDFS-backed store does not support. */
  def quotaGateStream(
      spark: SparkSession,
      schema: StructType,
      path: String,
      quotaCents: Long): Dataset[QuotaDecision] = {
    import spark.implicits._
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    val processor =
      new StatefulProcessor[Long, (Long, Long, java.sql.Timestamp, Long), QuotaDecision] {
        @transient private var spent: ValueState[Long] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          spent = getHandle.getValueState[Long](
            "spent_cents", E.scalaLong, TTLConfig.NONE)
        override def handleInputRows(
            key: Long,
            rows: Iterator[(Long, Long, java.sql.Timestamp, Long)],
            timers: TimerValues): Iterator[QuotaDecision] = {
          var s = if (spent.exists()) spent.get() else 0L
          val out = rows.toArray.sortBy(r => (r._3.getTime, r._2)).map {
            case (uid, eid, _, cents) =>
              s += cents
              QuotaDecision(eid, uid, s <= quotaCents)
          }
          spent.update(s)
          out.iterator
        }
      }
    spark.readStream
      .schema(schema)
      .parquet(path)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(processor, TimeMode.None, OutputMode.Append,
        E.product[QuotaDecision])
  }

  /** Run a streaming query to completion against the (finite) source and
    * return the materialized result from the memory sink. Used by tests to
    * prove batch/stream parity. */
  /** Streaming data-quality gate — the unbounded-ingest twin of
    * [[graft.ops.ExpectationsOps]] (the lakehouse `EXPECT ... ON
    * VIOLATION` shape applied at the stream edge, where corpus ingest
    * actually happens). Each micro-batch:
    *
    *  1. `fail` rules run first — a violation throws, failing the QUERY
    *    (the scheduler-gate contract: a poisoned batch stops ingest
    *    rather than landing);
    *  2. drop/fail violators land in the quarantine lane WITH their
    *    violated-rule tags (dead-letter — nothing silently lost);
    *  3. clean rows land in the clean lane; `warn` violations pass
    *    through but count in the metrics lane (per-epoch rule counts —
    *    additive, so summing the lane reproduces the batch metrics).
    *
    * All three lanes write `epoch=<id>/` partition dirs with OVERWRITE:
    * a replayed epoch after a crash/restart rewrites the same directory,
    * making every lane EXACTLY-ONCE without a transactional sink — the
    * same idempotent-epoch discipline Spark's own foreachBatch guide
    * prescribes. Per-batch work is one codegen'd projection + filters
    * (zero shuffle) plus one limit(1) probe per fail rule; state is the
    * file-source offset log only, so a 100 TB/day ingest holds nothing
    * on the driver. */
  def expectationsGateStream(
      spark: SparkSession,
      schema: StructType,
      path: String,
      exps: Seq[graft.ops.ExpectationsOps.Expectation],
      cleanPath: String,
      quarantinePath: String,
      metricsPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(path)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.ops.ExpectationsOps.enforce(batch, exps)
        graft.ops.ExpectationsOps.quarantine(batch, exps)
          .write.mode("overwrite").parquet(s"$quarantinePath/epoch=$epochId")
        graft.ops.ExpectationsOps.clean(batch, exps)
          .write.mode("overwrite").parquet(s"$cleanPath/epoch=$epochId")
        graft.ops.ExpectationsOps.metrics(batch, exps)
          .write.mode("overwrite").parquet(s"$metricsPath/epoch=$epochId")
        ()
      }
      .start()

  /** STREAMING twin of the multimodal decode/quarantine ledger
    * ([[graft.ops.MultimodalOps.decodeReport]]): each micro-batch of
    * binary payloads is classified + decode-attempted partition-parallel,
    * decodable rows land in the clean sink, failures in the quarantine
    * sink, and the per-(format, decoded) counters in a metrics sink —
    * the same three-lane shape as the expectations gate, applied at the
    * multimodal ingest edge. Epoch-keyed overwrites make a replayed
    * batch idempotent. At 100 TB this is where the quarantine RATE
    * becomes a live operational signal instead of a post-hoc audit. */
  def decodeGateStream(
      spark: SparkSession,
      schema: StructType,
      path: String,
      cleanPath: String,
      quarantinePath: String,
      metricsPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(path)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        import org.apache.spark.sql.functions.{col, count, lit, udf}
        // per-row status: no join, no shuffle on the row lanes — the
        // only exchange is the O(formats) metrics aggregate
        val statusUdf = udf((bytes: Array[Byte]) => {
          val (fmt, decoded) = graft.ops.MultimodalOps.decodeStatusOf(bytes)
          (fmt, decoded)
        })
        val tagged = batch
          .withColumn("__st", statusUdf(col("payload")))
          .withColumn("format", col("__st._1"))
          .withColumn("decoded", col("__st._2"))
          .drop("__st")
          .persist() // three sinks; decode each payload once
        try {
          tagged.filter(col("decoded")).drop("format", "decoded")
            .write.mode("overwrite").parquet(s"$cleanPath/epoch=$epochId")
          tagged.filter(!col("decoded")).drop("decoded")
            .write.mode("overwrite").parquet(s"$quarantinePath/epoch=$epochId")
          tagged.groupBy(col("format"), col("decoded"))
            .agg(count(lit(1)).as("n"))
            .write.mode("overwrite").parquet(s"$metricsPath/epoch=$epochId")
        } finally tagged.unpersist()
        ()
      }
      .start()

  /** Streaming twin of the WARC→clean batch pipeline
    * ([[graft.ops.WarcOps]] + the RE2 strip chain + the length gate):
    * crawl segments land as FILES, so the unbounded form tails a
    * directory through Spark's binaryFile source — admission control
    * (maxFilesPerTrigger/maxBytesPerTrigger) composes at the source
    * the usual way. Per-file byte decode inside the micro-batch task;
    * stateless thereafter, so outputs append exactly like the batch
    * rows (parity pinned by WarcSpec). */
  def warcIngestStream(
      spark: SparkSession, path: String,
      minChars: Int = 60): DataFrame = {
    import spark.implicits._
    // binaryFile's fixed schema must be stated explicitly for streams
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField => SF, StructType => ST, TimestampType}
    val binarySchema = ST(Seq(
      SF("path", StringType),
      SF("modificationTime", TimestampType),
      SF("length", LongType),
      SF("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc")
      .schema(binarySchema)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        graft.ops.WarcOps.parseWarc(bytes)
          .filter(_.recType.equalsIgnoreCase("response"))
          .flatMap { r =>
            graft.ops.WarcOps.httpResponse(r.payload).map {
              case (status, _, body) =>
                (r.targetUri, status,
                  new String(body, java.nio.charset.StandardCharsets.UTF_8))
            }
          }
      }.toDF("uri", "status", "body")
      .withColumn("clean", graft.ops.TextOps.stripHtml(col("body")))
      .filter(length(col("clean")) >= minChars)
      .select(col("uri"), col("status"),
        length(col("clean")).as("n_clean"),
        md5(col("clean").cast("binary")).as("clean_md5"))
  }

  /** Streaming twin of the mbox/MIME front door ([[graft.ops.MailOps]]):
    * mailbox files land in a directory and each message extracts as it
    * arrives — same framing/unfolding/encoded-word/multipart walk as
    * the batch lane, per-file flatMap, bounded memory (one mailbox
    * decoded at a time), zero shuffle. Only the file path is projected
    * besides content, matching the WARC twin's discipline. */
  def mboxIngestStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField => SF, StructType => ST, TimestampType}
    val binarySchema = ST(Seq(
      SF("path", StringType),
      SF("modificationTime", TimestampType),
      SF("length", LongType),
      SF("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.mbox")
      .schema(binarySchema)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val file = p.substring(p.lastIndexOf('/') + 1)
        val mbox = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        graft.ops.MailOps.extractMbox(0L, mbox).map { m =>
          (file, m.msg_seq, m.subject, m.from, m.content_type, m.body)
        }
      }.toDF("file", "msg_seq", "subject", "from", "content_type", "body")
      .select(col("file"), col("msg_seq"), col("subject"), col("from"),
        col("content_type"),
        length(col("body")).as("body_len"),
        md5(col("body").cast("binary")).as("body_md5"))
  }

  def runToCompletion(
      spark: SparkSession, df: DataFrame, name: String,
      mode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
