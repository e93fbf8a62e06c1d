package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, EventOps}
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

  test("stateful sessionization matches batch sessionize on driver events") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    // Sentinel user far past the last real event: once it flows through,
    // the watermark passes every real session's timeout, so the stream's
    // append output contains ALL real sessions closed — making it
    // set-comparable with the batch result. (Without it, each user's last
    // session would still be open state, not output.)
    val maxTs = events.agg(org.apache.spark.sql.functions.max($"ts")).head.getTimestamp(0)
    val sentinel = Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)))
      .toDF("user_id", "ts")
    val staged = events.select($"user_id".cast("long").as("user_id"), $"ts")
      .unionByName(sentinel)
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_parity").toString
    staged.write.mode("overwrite").parquet(dir)

    val src = spark.readStream.schema(staged.schema).parquet(dir)
    val q = StreamingOps.sessionizeStateful(spark, src, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_parity").start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.table("sess_parity")
      .filter($"user_id" >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    val batch = EventOps.sessionize(events, 30)
      .select($"user_id".cast("long"), $"n_events", $"session_start", $"session_end")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming dedup keys equal batch distinct keys") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    events.write.mode("overwrite").parquet(dir)

    val got = StreamingOps.runToCompletion(
      spark,
      StreamingOps.dedupFirstEvent(spark, events.schema, dir),
      "stream_dedup", mode = "append")
      .select($"user_id", $"event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val batch = events.select($"user_id", $"event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stream-stream view→purchase join equals batch join") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val dir = java.nio.file.Files.createTempDirectory("graft_ssjoin").toString
    events.write.mode("overwrite").parquet(dir)

    val got = StreamingOps.runToCompletion(
      spark,
      StreamingOps.viewToPurchaseJoin(spark, events.schema, dir),
      "stream_ssjoin", mode = "append")
      .select($"buy_id", $"view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val views = events.filter($"event_type" === "view")
      .select($"user_id".as("v_user_id"), $"ts".as("view_ts"), $"event_id".as("view_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("buy_ts"), $"event_id".as("buy_id"))
    val batch = purchases.join(views,
        $"user_id" === $"v_user_id" && $"view_ts" <= $"buy_ts" &&
          $"view_ts" >= $"buy_ts" - org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select($"buy_id", $"view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stateful sessionization emits closed sessions with correct extents") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events 5 min apart (session A), then one 3 h later — the
    // gap closes session A within the micro-batch; user 2's 23:00 event
    // drives the watermark to 21:00, firing the event-time timeout that
    // closes user 1's second session. User 2's own session stays open.
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")),
      (1L, ts("2024-01-01 13:00:00")),
      (2L, ts("2024-01-01 23:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    rows.toDF("user_id", "ts").write.mode("overwrite").parquet(dir)

    val src = spark.readStream
      .schema(rows.toDF("user_id", "ts").schema)
      .parquet(dir)
    val sessions = StreamingOps.sessionizeStateful(spark, src, gapMinutes = 30)

    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (1L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")),
      (1L, 1L, ts("2024-01-01 13:00:00"), ts("2024-01-01 13:00:00"))))
  }

  test("streaming bloom decontamination equals the batch predicate, stateless") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    // probe set = the blocks of the first 25 docs (the benchmark side)
    val probeBlocks = graft.ops.DedupOps
      .tokenBlocks(docs.filter($"doc_id" < 25), $"doc_id", $"text", 8)
      .select($"block")
    val filt = graft.ops.BloomOps.buildFilter(probeBlocks, $"block", 1L << 16)
    val corpus = docs.filter($"doc_id" >= 25)
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_stream").toString
    corpus.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(corpus.schema).parquet(dir)
    val cleaned = StreamingOps.decontaminateStream(stream, $"text", filt)
    // stateless: the streaming plan must carry no state store operator
    val got = StreamingOps.runToCompletion(spark, cleaned, "stream_decon",
        mode = "append")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val batch = StreamingOps.decontaminateStream(corpus, $"text", filt)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == batch)
    assert(got.nonEmpty && got.size < corpus.count()) // something was dropped
  }

  test("streaming near-dup gate equals the batch first-wins LSH admission") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", $"text")
    // arrival order = doc_id (one second apart); a far-future sentinel doc
    // pushes the watermark past every real doc so the append-mode
    // doc-grain aggregation flushes its final groups
    val staged = docs
      .withColumn("ingest_ts",
        to_timestamp(lit("2024-01-01 00:00:00")) +
          make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
            $"doc_id".cast("double")))
      .unionByName(Seq(
        (99999999L, "watermark sentinel pushing far ahead zz yy xx ww vv uu",
          java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
        .toDF("doc_id", "text", "ingest_ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_stream").toString
    staged.write.mode("overwrite").parquet(dir)

    // see nearDupGateStream scaladoc: the FMGWS -> agg chain is safe here
    // (stage 1 emits at unchanged input event time) but Spark's global
    // check can't prove it and must be told so
    val checkConf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(checkConf, "false")
    val got =
      try StreamingOps.runToCompletion(
        spark,
        StreamingOps.nearDupGateStream(spark, staged.schema, dir,
          watermark = "1 hour", horizonMillis = 3600L * 1000),
        "stream_gate", mode = "append")
        .filter($"doc_id" < 99999999L)
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      finally spark.conf.unset(checkConf)

    val batch = DedupOps.nearDupGateBatch(docs, $"doc_id", $"text", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(got == batch)
    // the gate is discriminative on this corpus: some docs are retired
    assert(batch.exists(!_._2) && batch.count(_._2) > batch.size / 2)
  }

  test("streaming running-anomaly flags equal the batch prior-only z-score") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_anom_stream").toString
    val staged = events.select($"user_id", $"event_id", $"value", $"ts")
    staged.write.mode("overwrite").parquet(dir)

    val got = StreamingOps.runToCompletion(spark,
        StreamingOps.anomalyStream(spark, staged.schema, dir),
        "stream_anom", mode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventOps.runningAnomalies(events)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch)
    assert(batch.nonEmpty) // the detector fires on this corpus
  }

  test("streaming corpus clean equals the batch classify+filter+dedup") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // stage documents with a synthetic ingest timestamp (stable in doc_id)
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .withColumn("ingest_ts",
        to_timestamp(lit("2024-01-01 00:00:00")) +
          make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
            $"doc_id".cast("double")))
    val dir = java.nio.file.Files.createTempDirectory("graft_clean_stream").toString
    docs.write.mode("overwrite").parquet(dir)

    val got = StreamingOps.runToCompletion(
      spark,
      StreamingOps.corpusCleanStream(spark, docs.schema, dir),
      "stream_clean", mode = "append")
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    val batchKept = docs
      .withColumn("lang_guess", graft.ops.TextOps.langId($"text"))
      .withColumn("quality", graft.ops.TextOps.qualityScore($"text"))
      .withColumn("fp", graft.ops.TextOps.fingerprint($"text"))
      .filter($"lang_guess" === "en" && $"quality" >= 0.5)
    val batch = batchKept
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"fp")
          .orderBy($"ingest_ts", $"doc_id")))
      .filter($"rk" === 1)
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    // streaming dropDuplicates keeps the FIRST ARRIVING row per fp; with a
    // single staged batch arrival order is not pinned, so compare the kept
    // fingerprint SET (one survivor per fp, same fps) rather than doc ids
    val gotFps = batchKept.filter($"doc_id".isInCollection(
      if (got.isEmpty) Seq(-1L) else got.toSeq))
      .select($"fp").collect().map(_.getString(0)).toSet
    val batchFps = batchKept.filter($"doc_id".isInCollection(
      if (batch.isEmpty) Seq(-1L) else batch.toSeq))
      .select($"fp").collect().map(_.getString(0)).toSet
    assert(got.size == gotFps.size, "streaming kept more than one doc per fingerprint")
    assert(gotFps == batchFps)
    assert(got.nonEmpty)
  }

  test("native session_window aggregation: stream equals batch, covers all events") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"user_id", $"ts")
    // sentinel far past the last event so the watermark closes every real
    // session (same discipline as the stateful sessionizer parity test)
    val maxTs = events.agg(max($"ts")).head.getTimestamp(0)
    val sentinel = Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)))
      .toDF("user_id", "ts")
    val staged = events.unionByName(sentinel)
    val dir = java.nio.file.Files.createTempDirectory("graft_sesswin").toString
    staged.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(staged.schema).parquet(dir)
    val got = StreamingOps.runToCompletion(spark,
        StreamingOps.sessionWindowCounts(stream, "30 minutes", Some("1 hour")),
        "sess_win", mode = "append")
      .filter($"user_id" >= 0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet

    // the SAME expression over the batch frame — one definition, two modes
    val batch = StreamingOps.sessionWindowCounts(events, "30 minutes", None)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
    assert(got == batch)
    // every event lands in exactly one session
    val total = batch.toSeq.map(_._3).sum
    assert(total == events.count())
  }

  test("theta/KLL sketch aggregates run in streaming and match batch estimates") {
    import spark.implicits._
    import graft.functions.{CmsFunctions, KllFunctions, ThetaFunctions}
    // the custom TypedImperativeAggregates must survive the state store's
    // serialize/deserialize path (compact-sketch roundtrip) — a streaming
    // complete-mode aggregation exercises it every micro-batch
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"event_type", $"user_id", $"value")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sketch").toString
    events.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream.schema(events.schema).parquet(dir)
      .groupBy($"event_type")
      .agg(
        ThetaFunctions.theta_sketch_agg($"user_id".cast("string")).as("tsk"),
        KllFunctions.kll_sketch_agg($"value").as("ksk"),
        CmsFunctions.cms_sketch_agg($"user_id").as("csk"))
      .select($"event_type",
        org.apache.spark.sql.functions.round(
          ThetaFunctions.theta_estimate($"tsk")).cast("long").as("users"),
        org.apache.spark.sql.functions.round(
          KllFunctions.kll_quantile($"ksk", org.apache.spark.sql.functions.lit(0.5)), 2)
          .as("p50"),
        CmsFunctions.cms_estimate($"csk",
          org.apache.spark.sql.functions.lit(7L)).as("c7"))
    val rows = StreamingOps.runToCompletion(spark, streamed, "stream_sketch").collect()
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // KLL ran through the same path: every group produced a finite median
    assert(rows.forall(r => !r.isNullAt(2) && !r.getDouble(2).isNaN))
    // CMS is deterministic + exact-merge: streamed count == batch count
    val cmsBatch = events.groupBy($"event_type")
      .agg(CmsFunctions.cms_sketch_agg($"user_id").as("csk"))
      .select($"event_type", CmsFunctions.cms_estimate($"csk",
        org.apache.spark.sql.functions.lit(7L)).as("c7"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cmsGot = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(cmsGot == cmsBatch, s"CMS stream $cmsGot != batch $cmsBatch")

    // theta is deterministic (order-independent min-hash set): the streamed
    // estimate must EQUAL the batch estimate exactly
    val batch = events.groupBy($"event_type")
      .agg(ThetaFunctions.theta_sketch_agg($"user_id".cast("string")).as("tsk"))
      .select($"event_type", org.apache.spark.sql.functions.round(
        ThetaFunctions.theta_estimate($"tsk")).cast("long").as("users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch, s"stream $got != batch $batch")
    assert(got.nonEmpty)
  }

  test("stream-static broadcast enrichment equals the batch join") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val dim = Tables.load(spark, TestSpark.sfDir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    val dir = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    events.write.mode("overwrite").parquet(dir)

    val enriched = StreamingOps.enrichWithDim(
      spark, events.schema, dir, dim, "user_id", "c_custkey")
    val got = StreamingOps.runToCompletion(spark, enriched, "stream_enrich",
        mode = "append")
      .select($"event_id", $"c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val batch = events.join(dim, $"user_id" === $"c_custkey")
      .select($"event_id", $"c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stream-stream LEFT OUTER join emits matches exactly and unmatched views with NULLs") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"ts", $"user_id", $"event_type", $"event_id", $"value")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // several files → several micro-batches, so watermark advancement
    // between batches can evict view state and emit the NULL rows
    events.repartition(4).write.mode("overwrite").parquet(dir)

    val joined = StreamingOps.viewToPurchaseLeftJoin(spark, events.schema, dir)
    val got = StreamingOps.runToCompletion(spark, joined, "stream_left_join",
        mode = "append")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    val views = events.filter($"event_type" === "view")
      .select($"user_id".as("v_user_id"), $"ts".as("view_ts"), $"event_id".as("view_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("buy_ts"), $"event_id".as("buy_id"))
    val batch = views.join(purchases,
        $"v_user_id" === $"user_id" && $"buy_ts" >= $"view_ts" &&
          $"buy_ts" <= $"view_ts" + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select($"v_user_id", $"view_id", $"buy_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    val (gotMatched, gotNull) = got.partition(_._3 >= 0)
    val (batchMatched, batchNull) = batch.partition(_._3 >= 0)
    // matched rows are exact; NULL emission requires the watermark to have
    // closed the view's window, so the stream emits a SUBSET of batch NULLs
    assert(gotMatched == batchMatched)
    assert(gotNull.subsetOf(batchNull), (gotNull -- batchNull).take(3).toString)
    assert(gotNull.nonEmpty, "no unmatched view was ever emitted with NULLs")
  }

  test("streaming materialized-view maintenance converges to the batch rollup") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, max, sum}
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"ts", $"user_id", $"event_type", $"value")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // several files + maxFilesPerTrigger=1 → several UPDATE micro-batches,
    // so the final store state proves per-batch upserts COMPOSE, not just
    // that one big batch equals batch
    events.repartition(4).write.mode("overwrite").parquet(dir)

    val store = scala.collection.concurrent.TrieMap
      .empty[(Long, String), (Long, java.math.BigDecimal, java.sql.Timestamp)]
    val src = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingOps.maintainAggStream(spark, src, store)
    try q.processAllAvailable()
    finally q.stop()

    val batch = events.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("s"),
        max($"ts").as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDecimal(3), r.getTimestamp(4)))).toMap

    assert(store.size == batch.size)
    batch.foreach { case (k, (n, s, t)) =>
      val (gn, gs, gt) = store(k)
      assert(gn == n && gs.compareTo(s) == 0 && gt == t, s"key $k: ($gn,$gs,$gt) != ($n,$s,$t)")
    }
  }

  test("transformWithState quota gate equals the batch running-sum cutoff") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{round, sum}
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"user_id", $"event_id", $"ts", $"value")
    val dir = java.nio.file.Files.createTempDirectory("graft_quota").toString
    events.write.mode("overwrite").parquet(dir)
    val quota = 500 * 100L // 500 currency units per user, in cents

    // transformWithState state is column-family-based → RocksDB provider
    // (bundled rocksdbjni), not the default HDFS-backed store
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val got =
      try StreamingOps.runToCompletion(
        spark,
        StreamingOps.quotaGateStream(spark, events.schema, dir, quota).toDF(),
        "stream_quota", mode = "append")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      finally prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }

    val w = W.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = events
      .withColumn("cents", round($"value" * 100).cast("long"))
      .withColumn("run", sum($"cents").over(w))
      .select($"event_id", $"user_id", ($"run" <= quota).as("admitted"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    assert(got == batch)
    // the gate actually bites: both admitted and rejected events exist
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("streaming rolling 7-day distinct users equals batch on event days") {
    import spark.implicits._
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"user_id", $"ts")
    // sentinel 10 days past the last real event: watermark passes every
    // real window's close so the append output contains them all; its own
    // windows start ≥ maxDay+10, beyond any real expansion (maxDay+6)
    val maxTs = events.agg(org.apache.spark.sql.functions.max($"ts")).head.getTimestamp(0)
    val staged = events.unionByName(Seq(
      (-1L, new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)))
      .toDF("user_id", "ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rolling_distinct").toString
    staged.write.mode("overwrite").parquet(dir)

    val got = StreamingOps.runToCompletion(
      spark,
      StreamingOps.rollingDistinctUsers(spark, staged.schema, dir),
      "stream_rolling_distinct", mode = "append")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap

    val batch = graft.queries.Registry
      .queries("an_rolling_distinct_users")(spark, TestSpark.sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap

    // batch restricts to actual event days; the stream also emits covered
    // gap/tail days — parity on the batch day set
    assert(batch.nonEmpty)
    batch.foreach { case (d, n) =>
      assert(got.get(d).contains(n), s"day $d: stream=${got.get(d)} batch=$n")
    }
  }

  test("MV maintenance recovers from its checkpoint across a stop/restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, max, sum}
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"ts", $"user_id", $"event_type", $"value")
    // time-split halves: the same users appear in both, so the final
    // counts are only right if the rollup state SURVIVES the restart —
    // a from-scratch run 2 would report run-2-only counts for those keys
    val cut = events.selectExpr("percentile_approx(ts, 0.5)").head().getTimestamp(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ckpt").toString
    events.filter($"ts" <= cut).repartition(2).write.mode("append").parquet(dir)

    val store = scala.collection.concurrent.TrieMap
      .empty[(Long, String), (Long, java.math.BigDecimal, java.sql.Timestamp)]
    def start() = StreamingOps.maintainAggStream(
      spark,
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir),
      store, checkpoint = Some(ckpt))

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(store.nonEmpty, "run 1 must process at least one micro-batch")
    val afterRun1 = store.readOnlySnapshot().toMap

    events.filter($"ts" > cut).repartition(2).write.mode("append").parquet(dir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val batch = events.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("s"),
        max($"ts").as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDecimal(3), r.getTimestamp(4)))).toMap
    assert(store.size == batch.size)
    batch.foreach { case (k, (n, s, t)) =>
      val (gn, gs, gt) = store(k)
      assert(gn == n && gs.compareTo(s) == 0 && gt == t,
        s"key $k: ($gn,$gs,$gt) != ($n,$s,$t)")
    }
    // the restart genuinely continued: some key's count grew across runs
    assert(batch.exists { case (k, (n, _, _)) =>
      afterRun1.get(k).exists(_._1 < n) },
      "expected at least one key updated in BOTH runs")
  }

  test("transformWithState quota gate recovers spend state across a stop/restart") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{round, sum}
    val events = Tables.load(spark, TestSpark.sfDir, "events")
      .select($"user_id", $"event_id", $"ts", $"value")
    val cut = events.selectExpr("percentile_approx(ts, 0.5)").head().getTimestamp(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_quota_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_quota_rckpt").toString
    events.filter($"ts" <= cut).write.mode("append").parquet(dir)
    val quota = 500 * 100L

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val decisions = scala.collection.concurrent.TrieMap.empty[Long, (Long, Boolean)]
    def start() = StreamingOps.quotaGateStream(spark, events.schema, dir, quota)
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => // QuotaDecision = (event_id, user_id, admitted)
          decisions.put(r.getLong(0), (r.getLong(1), r.getBoolean(2))))
        ()
      }
      .start()
    try {
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      assert(decisions.nonEmpty, "run 1 must emit decisions")
      // per-user cumulative spend must RESUME from the recovered RocksDB
      // state: users part-way through their quota at the stop get their
      // part-2 cutoffs at the right global position, not a fresh budget
      events.filter($"ts" > cut).write.mode("append").parquet(dir)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }

    val w = W.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = events
      .withColumn("cents", round($"value" * 100).cast("long"))
      .withColumn("run", sum($"cents").over(w))
      .select($"event_id", $"user_id", ($"run" <= quota).as("admitted"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(decisions.readOnlySnapshot().toMap == batch)
    // a user must exist whose admission flips ACROSS the restart boundary —
    // the only way that is right is recovered cumulative state
    val flipped = events
      .withColumn("cents", round($"value" * 100).cast("long"))
      .withColumn("run", sum($"cents").over(w))
      .groupBy($"user_id")
      .agg(
        sum(org.apache.spark.sql.functions.when($"ts" <= cut && $"run" <= quota, 1)
          .otherwise(0)).as("admitted_before"),
        sum(org.apache.spark.sql.functions.when($"ts" > cut && $"run" > quota, 1)
          .otherwise(0)).as("rejected_after"))
      .filter($"admitted_before" > 0 && $"rejected_after" > 0)
      .count()
    assert(flipped > 0, "fixture must contain a user crossing the quota post-restart")
  }

  test("near-dup gate recovers band-claim state across a stop/restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", $"text")
    val split = docs.selectExpr("percentile_approx(doc_id, 0.5)").head().getLong(0)
    val base = to_timestamp(lit("2024-01-01 00:00:00"))

    // part 1 at 00:00:00 + id sec; a sentinel at 01:30 advances the
    // watermark (delay 1h → 00:30) so run 1 FLUSHES doc decisions
    val part1 = docs.filter($"doc_id" < split)
      .withColumn("ingest_ts", base + make_interval(
        lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), $"doc_id".cast("double")))
      .unionByName(Seq((50000000L,
        "first watermark sentinel aa bb cc dd ee ff gg",
        java.sql.Timestamp.valueOf("2024-01-01 01:30:00")))
        .toDF("doc_id", "text", "ingest_ts"))

    // part 2 at 02:00 + offset sec (AFTER the recovered watermark), with
    // PLANTED COPIES of three part-1 texts: their bands were claimed in
    // run 1, so they can only be retired if that state survived the
    // restart. Second sentinel at 06:00 flushes run 2.
    val planted = docs.filter($"doc_id" < 3)
      .select(($"doc_id" + 150000000L).as("doc_id"), $"text")
    val part2 = docs.filter($"doc_id" >= split)
      .select(($"doc_id" + 100000000L).as("doc_id"), $"text")
      .unionByName(planted)
      .withColumn("ingest_ts",
        to_timestamp(lit("2024-01-01 02:00:00")) + make_interval(
          lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
          ($"doc_id" % 1000L).cast("double")))
      .unionByName(Seq((200000000L,
        "second watermark sentinel zz yy xx ww vv uu tt",
        java.sql.Timestamp.valueOf("2024-01-01 06:00:00")))
        .toDF("doc_id", "text", "ingest_ts"))

    val dir = java.nio.file.Files.createTempDirectory("graft_gate_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_rckpt").toString
    part1.write.mode("append").parquet(dir)

    val decisions = scala.collection.concurrent.TrieMap.empty[Long, Boolean]
    val checkConf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(checkConf, "false")
    // 12h claim horizon: part-1 band claims must still be live at 02:00
    def start() = StreamingOps.nearDupGateStream(spark, part1.schema, dir,
        watermark = "1 hour", horizonMillis = 12L * 3600 * 1000)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => decisions.put(r.getLong(0), r.getBoolean(1)))
        ()
      }
      .start()

    try {
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      assert(decisions.nonEmpty, "run 1 must flush at least one decision")
      val run1Count = decisions.size

      part2.write.mode("append").parquet(dir)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      assert(decisions.size > run1Count, "run 2 must add decisions")

      // truth: the batch first-wins gate over the full staged corpus
      val staged = part1.unionByName(part2)
      val batch = DedupOps.nearDupGateBatch(staged, $"doc_id", $"text", $"doc_id")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      val sentinels = Set(50000000L, 200000000L)
      val got = decisions.readOnlySnapshot().toMap.filterNot(k => sentinels(k._1))
      val want = batch.filterNot(k => sentinels(k._1))
      assert(got == want)
      // the planted run-2 copies were retired by RECOVERED run-1 claims
      Seq(150000000L, 150000001L, 150000002L).foreach { id =>
        assert(got.get(id).contains(false),
          s"planted dup $id must be retired by recovered band-claim state")
      }
    } finally spark.conf.unset(checkConf)
  }

  test("stream-stream interval join recovers buffered state across a stop/restart") {
    import spark.implicits._
    // staged corpus: part-2 purchases can ONLY pair with part-1 views via
    // the join buffers recovered from the checkpoint — a from-scratch run 2
    // would re-read only new files and emit nothing for them
    val base = java.sql.Timestamp.valueOf("2026-01-05 10:00:00")
    def t(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    def ev(id: Long, min: Int, user: Long, tpe: String) =
      (id, t(min), user, tpe, 1.0)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val part1 = Seq(
      ev(1, 0, 1, "view"), ev(2, 5, 1, "view"),
      ev(3, 2, 2, "view"), ev(4, 8, 2, "view"),
      ev(101, 15, 1, "purchase") // in-run match for user 1
    ).toDF(cols: _*)
    val part2 = Seq(
      // pairs ONLY against user-2 views buffered before the restart
      ev(201, 40, 2, "purchase"),
      // and fresh traffic to prove the restarted stream keeps flowing
      ev(5, 45, 3, "view"), ev(202, 50, 3, "purchase")
    ).toDF(cols: _*)

    val dir = java.nio.file.Files.createTempDirectory("graft_ssj_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssj_ckpt").toString
    part1.repartition(2).write.mode("append").parquet(dir)

    val pairs = scala.collection.concurrent.TrieMap.empty[(Long, Long), Boolean]
    def start() = StreamingOps.viewToPurchaseJoin(spark, part1.schema, dir)
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select($"buy_id", $"view_id").collect()
          .foreach(r => pairs.put((r.getLong(0), r.getLong(1)), true))
        ()
      }
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val run1 = pairs.keySet.toSet
    assert(run1 == Set((101L, 1L), (101L, 2L)), run1.toString)

    part2.repartition(2).write.mode("append").parquet(dir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // truth: the batch interval join over the full staged corpus
    val staged = part1.unionByName(part2)
    val views = staged.filter($"event_type" === "view")
      .select($"user_id".as("v_user_id"), $"ts".as("view_ts"), $"event_id".as("view_id"))
    val buys = staged.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("buy_ts"), $"event_id".as("buy_id"))
    val batch = buys.join(views,
        $"user_id" === $"v_user_id" && $"view_ts" <= $"buy_ts" &&
          $"view_ts" >= $"buy_ts" - org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select($"buy_id", $"view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.keySet.toSet == batch, s"stream=${pairs.keySet} batch=$batch")
    // the restart-only attribution: purchase 201 paired with the user-2
    // views that were sitting in the RECOVERED join buffers
    assert(pairs.contains((201L, 3L)) && pairs.contains((201L, 4L)),
      "post-restart purchase must match pre-restart buffered views")
  }

  test("expectations gate: lanes match the batch split across a stop/restart") {
    import spark.implicits._
    import graft.ops.ExpectationsOps
    import graft.ops.ExpectationsOps.Expectation
    val exps = Seq(
      Expectation("lang_supported", "lang IN ('en','de','fr','es')", "drop"),
      Expectation("min_length", "n_chars >= 60", "drop"),
      Expectation("not_huge", "n_chars <= 400", "warn"),
      Expectation("id_present", "doc_id IS NOT NULL", "fail"))
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val split = docs.selectExpr("percentile_approx(doc_id, 0.5)").head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_expect").toString
    val (src, clean, quar, met, ckpt) = (s"$tmp/src", s"$tmp/clean",
      s"$tmp/quarantine", s"$tmp/metrics", s"$tmp/ckpt")
    def start() = StreamingOps.expectationsGateStream(spark, docs.schema,
      src, exps, clean, quar, met, ckpt)

    docs.filter($"doc_id" < split).write.mode("append").parquet(src)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    docs.filter($"doc_id" >= split).write.mode("append").parquet(src)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // clean lane == batch clean over the full corpus, exactly once
    val gotClean = spark.read.parquet(clean).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val wantClean = ExpectationsOps.clean(docs, exps).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(gotClean == wantClean)
    assert(gotClean.distinct == gotClean, "no duplicate epochs in the lane")

    // quarantine lane == batch quarantine, tags included
    val gotQ = spark.read.parquet(quar).select("doc_id", "violated")
      .as[(Long, String)].collect().toMap
    val wantQ = ExpectationsOps.quarantine(docs, exps)
      .select("doc_id", "violated").as[(Long, String)].collect().toMap
    assert(gotQ == wantQ)

    // metrics lane sums to the batch metrics (counts are additive)
    val gotM = spark.read.parquet(met).groupBy("expectation")
      .agg(org.apache.spark.sql.functions.sum("rows").as("rows"))
      .as[(String, Long)].collect().toMap
    val wantM = ExpectationsOps.metrics(docs, exps)
      .select("expectation", "rows").as[(String, Long)].collect().toMap
    assert(gotM == wantM)
  }

  test("decode gate: media lanes match the batch ledger across a stop/restart") {
    import spark.implicits._
    import graft.ops.MultimodalOps
    val tmp = java.nio.file.Files.createTempDirectory("graft_decode_gate").toString
    val (src, clean, quar, met, ckpt) =
      (s"$tmp/src", s"$tmp/clean", s"$tmp/quarantine", s"$tmp/metrics", s"$tmp/ckpt")
    // mixed corpus: decodable BMP fixtures interleaved with opaque bytes
    // and truncated (quarantining) BMPs — same lanes as the batch report
    val ids = spark.range(24).select($"id".as("doc_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("~doc "),
        $"id".cast("string")).as("text"))
    val bmp = MultimodalOps.asBmpPayload(
      spark, ids.filter($"doc_id" % 3 === 0), "doc_id")
    val bmpTrunc = MultimodalOps.asBmpPayload(
        spark, ids.filter($"doc_id" % 3 === 1), "doc_id")
      .select($"doc_id",
        org.apache.spark.sql.functions.substring($"payload", 1, 30).as("payload"))
    val raw = MultimodalOps.asBinaryPayload(
      ids.filter($"doc_id" % 3 === 2), "doc_id", "text")
    val media = bmp.unionAll(bmpTrunc).unionAll(raw)
    def start() = StreamingOps.decodeGateStream(spark, media.schema,
      src, clean, quar, met, ckpt)
    media.filter($"doc_id" < 12).write.mode("append").parquet(src)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    media.filter($"doc_id" >= 12).write.mode("append").parquet(src)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // clean lane = exactly the decodable ids, once each, payloads intact
    val gotClean = spark.read.parquet(clean).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(gotClean == (0L until 24L by 3).toSeq, gotClean.toString)
    // quarantine lane keeps the detected format tag
    val gotQ = spark.read.parquet(quar).select("doc_id", "format")
      .as[(Long, String)].collect().toMap
    assert(gotQ.keySet == ((1L until 24L by 3) ++ (2L until 24L by 3)).toSet)
    assert(gotQ.filter(_._1 % 3 == 1).values.forall(_ == "bmp"))
    assert(gotQ.filter(_._1 % 3 == 2).values.forall(_ == "raw"))
    // metrics lane sums to the batch ledger's counters
    val gotM = spark.read.parquet(met).groupBy("format", "decoded")
      .agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .as[(String, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val wantM = MultimodalOps.decodeReport(spark, media).toDF()
      .groupBy("format", "decoded")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotM == wantM, s"got $gotM want $wantM")
  }

  test("expectations gate: a violated fail rule stops the stream") {
    import spark.implicits._
    import graft.ops.ExpectationsOps.Expectation
    val exps = Seq(Expectation("id_present", "doc_id IS NOT NULL", "fail"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_expect_fail").toString
    val bad = Seq((Option.empty[java.lang.Long], "en", 100L))
      .toDF("doc_id", "lang", "n_chars")
    bad.write.mode("append").parquet(s"$tmp/src")
    val q = StreamingOps.expectationsGateStream(spark, bad.schema,
      s"$tmp/src", exps, s"$tmp/clean", s"$tmp/quarantine", s"$tmp/metrics",
      s"$tmp/ckpt")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage.contains("id_present")),
      s"expected the fail-rule name in the failure chain: ${e.getMessage}")
  }

  test("frontier stream: batch parity + per-host seq continues across waves") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_frontier").toString
    // the curation gate's allowed rows, ingest_ts monotone in doc_id so
    // the batch window's doc order equals the stream's (ts, doc) order
    def wave(ids: Range) = spark.range(ids.start, ids.end)
      .select($"id".as("doc_id"),
        concat(lit("host"), ($"id" % 17).cast("string"),
          lit(".example.com")).as("host"),
        (($"id" % 17) % 10).cast("double").as("crawl_delay"),
        lit(true).as("allowed"),
        (to_timestamp(lit("2026-03-01 00:00:00")) + make_interval(
          lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
          $"id".cast("double"))).as("ingest_ts"))
      .filter(!($"doc_id" % 3 === 0 && ($"doc_id" % 17) % 2 === 0))
    val w1 = wave(0 until 100)
    val w2 = wave(100 until 150)
    val src = s"$tmp/gated"
    w1.select($"host", $"doc_id", $"crawl_delay", $"ingest_ts")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingOps.frontierStream(spark, schema, src)
      .writeStream.outputMode("append").format("memory")
      .queryName("frontier_waves").start()
    try {
      q.processAllAvailable()
      val afterW1 = spark.table("frontier_waves").count()
      assert(afterW1 == w1.count(), "wave 1 fully scheduled")
      w2.select($"host", $"doc_id", $"crawl_delay", $"ingest_ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("frontier_waves")
      .select($"doc_id", $"host", $"fetch_seq",
        $"fetch_offset_s".cast("double"))
      .collect().map(_.toSeq).toSet
    // batch twin over BOTH waves at once: per-host sequences must be
    // identical — streamed wave-2 rows CONTINUE each host's queue
    val want = graft.ops.RobotsOps.frontierSchedule(
        spark, w1.unionByName(w2))
      .select($"doc_id", $"host", $"fetch_seq",
        $"fetch_offset_s".cast("double"))
      .collect().map(_.toSeq).toSet
    assert(got == want,
      "stream must equal the batch window, including cross-wave continuation")
  }
}
