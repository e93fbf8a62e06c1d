package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Physical-plan shape guards: the properties that keep these queries fast
  * at 100 TB — filter/column pushdown into the parquet scan, broadcast of
  * dimension tables, top-N instead of global sort. A regression here won't
  * fail correctness but would be a scale cliff, so it fails the build.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    Registry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString

  test("q1: shipdate filter pushed to parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q6: scan reads only the needed columns") {
    val p = plan("q6_forecast_revenue")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // 4 predicate columns + extendedprice; no returnflag/linestatus/etc.
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_returnflag"),
      readSchema)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
  }

  test("q5: dimension tables broadcast, no cartesian") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q3: top-N planned as TakeOrderedAndProject, not global sort+limit") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q15: the revenue aggregate exchange is reused across the max and join branches") {
    // q15 reads lineitem once: the quarterly revenue aggregate feeds BOTH
    // the supplier join and the broadcast max, and Spark must stitch them
    // with a ReusedExchange. Losing the reuse silently doubles the
    // lineitem scan — at 100 TB that is the whole query cost. AQE
    // finalizes reuse only after execution, so run the SAME queryExecution.
    val df = Registry.queries("q15_top_supplier")(spark, TestSpark.sfDir)
    df.queryExecution.toRdd.count()
    // AdaptiveSparkPlan prints "== Final Plan ==" then "== Initial Plan ==";
    // only the final section is what actually ran
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("ReusedExchange") || p.contains("ReusedSubquery"),
      s"q15 lost its revenue-exchange reuse:\n$p")
    val lineitemScans = p.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(lineitemScans == 1, s"expected 1 lineitem scan, got $lineitemScans:\n$p")
  }

  test("an_scd2_history: both windows share ONE user_id exchange") {
    // the documented shape: lag-filter-row_number/lead all ride a single
    // hashpartitioning(user_id) shuffle — the filter preserves the
    // partitioning, so the second Window adds NO exchange. A second hash
    // exchange here doubles the shuffle of the whole dimension at 100 TB.
    val df = Registry.queries("an_scd2_history")(spark, TestSpark.sfDir)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
    val eventScans = p.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("events"))
    assert(eventScans == 1, s"expected 1 events scan, got $eventScans:\n$p")
  }

  test("pl_preference_pairs: ranking windows + count + groupBy share ONE exchange") {
    // both row_number windows, the group count, and the final groupBy all
    // key on (source, lang): one hashpartitioning exchange end to end
    val df = Registry.queries("pl_preference_pairs")(spark, TestSpark.sfDir)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
    val docScans = p.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("documents"))
    assert(docScans == 1, s"expected 1 documents scan, got $docScans:\n$p")
  }

  test("q11: scalar-subquery threshold is broadcast, not shuffled") {
    val p = plan("q11_important_balances")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("ann brute force: query side broadcast so candidates never shuffle") {
    val p = plan("ext_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("an_rollup: ONE Expand pass, not a union of grouped aggregates") {
    val p = plan("an_rollup")
    assert(p.linesIterator.count(_.contains("Expand [")) == 1, p)
    assert(!p.contains("Union"), p)
  }

  test("snk_parquet_partitioned: read back with partition pruning") {
    val p = plan("snk_parquet_partitioned")
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("o_orderpriority"),
      s"expected partition pruning on o_orderpriority:\n$p")
  }

  test("asof join: single window pass, no pair-materializing join") {
    val p = plan("ext_events_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window ["), p)
  }

  test("q21: one aggregate chain, no semi/anti join cascade") {
    val p = plan("q21_late_shippers")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"), p)
    // broadcast the supplier dimension, shuffle only on the agg keys
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pl_corpus_clean: dedup window is the only wide stage before the report agg") {
    val p = plan("pl_corpus_clean")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // classify/filter stages are shuffle-free: exchanges = fp window + final agg
    // (+ AQE may add one for the tiny ordered output)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 3, s"unexpected extra shuffles ($exchanges):\n$p")
  }

  test("tfidf: corpus count broadcast, no cartesian pair blowup") {
    val p = plan("ext_text_tfidf")
    assert(!p.contains("CartesianProduct"), p)
    // the one-row N aggregate joins in as a broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // per-doc top-k is a window + filter, not a global sort-limit
    assert(p.contains("Window"), p)
  }

  test("pl_pack_sequences: ONE data shuffle (per-source window feeds the agg)") {
    val p = plan("pl_pack_sequences")
    // window partitions by source; the (source, pack_id) agg reuses that
    // clustering (group keys are a superset), so no second hash exchange
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
  }

  test("pl_mix_weighted: filter is scan-side, single agg shuffle") {
    val p = plan("pl_mix_weighted")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("pl_crawl_curation: robots broadcast, doc side never shuffles for the join") {
    val p = plan("pl_crawl_curation")
    // the per-host robots table rides a broadcast — a shuffled join
    // would move the whole crawl for a few-MB dimension
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // doc side: per-partition byte walk → codegen'd host/path → verdict;
    // the ONLY exchange is the final presentation sort's range partition
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 0, s"expected no hash exchange on the doc side:\n$p")
  }

  test("pl_crawl_frontier: ONE data shuffle (the per-host politeness window)") {
    val p = plan("pl_crawl_frontier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Window"), p)
    // the robots join broadcasts and the window partitions by host —
    // exactly one hash exchange end to end
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
  }

  test("bigram logprob and substring coverage: key-equi joins only, no cartesian") {
    for (q <- Seq("ext_text_bigram_logprob", "ext_dedup_substring_shared")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n$p")
    }
  }

  test("new cleanup queries: key-equi joins only, no cartesian") {
    for (q <- Seq("ext_dedup_blocks", "ext_text_bloom_decontaminate",
        "pl_incremental_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n$p")
    }
  }

  test("rank-filter patterns plan WindowGroupLimit (map-side per-group top-k)") {
    // Spark 3.5+ rewrites `row_number() OVER (...) <= k` filters into
    // WindowGroupLimitExec — per-group limiting BEFORE the shuffle, so at
    // 100 TB only ≤k rows per key per mapper reach the exchange instead of
    // every row being shuffled and fully sorted. All our first-k-per-key
    // surfaces (deterministic sampling, QUALIFY, DISTINCT ON) must keep
    // planning into it: a refactor that hides the rank filter from the
    // optimizer (e.g. a barrier in between) silently reverts to full
    // window sorts.
    for (q <- Seq("pl_sample_hash_topk", "op_qualify", "op_distinct_on")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q lost the WindowGroupLimit rewrite:\n${p.take(2000)}")
    }
  }

  test("pl_length_buckets: every window is partitioned (no global sort funnel)") {
    val df = Registry.queries("pl_length_buckets")(spark, TestSpark.sfDir)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected window-based ranking in the plan")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned Window found:\n${df.queryExecution.optimizedPlan}")
  }

  test("pl_sample_weighted: top-k is TakeOrderedAndProject, window only post-limit") {
    val p = plan("pl_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the ES-key ranking itself must not be a global Sort over the corpus:
    // the only full-width Sort allowed is inside TakeOrderedAndProject
    val sorts = Registry.queries("pl_sample_weighted")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }
    assert(sorts.isEmpty, s"global SortExec found:\n$p")
  }

  test("pl_incremental_dedup: batch postings probe the index (semi-join present)") {
    val p = plan("pl_incremental_dedup")
    // the probe side of the shingle join is the batch-filtered index — a
    // LeftSemi against the broadcast batch-id list; without it the join
    // would be the corpus×corpus self-join this entry exists to avoid
    assert(p.contains("LeftSemi"), p)
  }

  test("pl_incremental_dedup_persisted: probe reads stored postings, corpus text never re-read") {
    // the at-scale default incremental path: corpus text is shingled ONCE
    // at index-build time; every later probe scans the persisted postings
    // parquet, and the only documents.parquet scans left in the plan are
    // the batch slice (source IN src0/src1)
    // other suites cache the bare documents frame in the shared session;
    // cache substitution would splice an InMemoryRelation (whose embedded
    // plan shows the unfiltered scan) into this plan and fail the
    // filter-shape assertion for the wrong reason
    spark.catalog.clearCache()
    val p = plan("pl_incremental_dedup_persisted")
    assert(p.contains("graft_shingle_idx"),
      s"probe must scan the persisted shingle index\n$p")
    val docScanLines = p.linesIterator.filter(_.contains("documents.parquet")).toSeq
    assert(docScanLines.nonEmpty &&
      docScanLines.forall(_.contains("In(source, [src0,src1])")),
      docScanLines.mkString("\n"))
  }

  test("pl_perplexity_buckets: broadcast thresholds, no global window/sort") {
    val df = Registry.queries("pl_perplexity_buckets")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.forall(_.partitionSpec.nonEmpty), p)
  }

  test("pl_near_dedup_gate: no pair join at all — band-partitioned window only") {
    val df = Registry.queries("pl_near_dedup_gate")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the gate's whole point: admission bits without candidate pairs — no
    // join of any kind, and the first-claimant window partitioned by band
    assert(!p.contains("Join"), p)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty), p)
  }

  test("an_anomaly_running: every window user-partitioned, no join") {
    val df = Registry.queries("an_anomaly_running")(spark, TestSpark.sfDir)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
    assert(!df.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("pl_dedup_cascade: no cartesian anywhere in the three-stage funnel") {
    val p = plan("pl_dedup_cascade")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("user-grain analytics rank via globalRowNumber: every window is partitioned") {
    // deciles / RFM terciles / Gini ranks run at USER grain (unbounded at
    // scale) — the r4 verdict flagged their unpartitioned ntile/row_number
    // windows; they now ride LayoutOps.globalRowNumber range buckets
    Seq("an_user_value_deciles", "an_rfm_segments", "an_gini_revenue").foreach { q =>
      val df = Registry.queries(q)(spark, TestSpark.sfDir)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"$q: unpartitioned Window found:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("quality ensemble + embed outliers: every ranking window is partitioned") {
    Seq("pl_quality_ensemble", "ext_embed_outliers").foreach { q =>
      val df = Registry.queries(q)(spark, TestSpark.sfDir)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"$q: unpartitioned Window found:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("pl_token_budget_alloc: cap broadcast back, no sort-merge join") {
    val p = plan("pl_token_budget_alloc")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pl_mix_temperature: rates broadcast back, no sort-merge join") {
    val p = plan("pl_mix_temperature")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("pl_shard_manifest: single agg shuffle, classifier/shard math scan-side") {
    val p = plan("pl_shard_manifest")
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("an_scd2_history: both windows share one user-keyed exchange") {
    val p = plan("an_scd2_history")
    // exactly 2 exchanges: the shared (user_id) window shuffle + the
    // output ORDER BY range partition — a third would mean the lag filter
    // and the version/lead windows stopped sharing their partitioning
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
  }

  test("ext_text_bm25: query-term IN filter sits below the tf aggregation") {
    val p = plan("ext_text_bm25")
    // the IN-list predicate must apply before (deeper in the tree than)
    // the aggregates, so the full vocabulary never reaches an aggregation
    val lines = p.linesIterator.toSeq
    val filterIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("term") && l.contains(" IN "))
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(filterIdx >= 0, s"no query-term IN filter found:\n$p")
    assert(aggIdx >= 0 && filterIdx > aggIdx,
      s"term filter (line $filterIdx) not below the aggregate (line $aggIdx):\n$p")
  }

  test("whole-stage codegen covers the q1 aggregation") {
    // AQE finalizes (and annotates codegen stages) only after execution.
    val df = Registry.queries("q1_pricing_summary")(spark, TestSpark.sfDir)
    df.collect() // count() would execute a different (re-optimized) plan
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages render as "*(n) Operator" in the final AQE plan
    assert(p.contains("*(") && p.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("*(")), p)
  }

  test("op_join_hint: BROADCAST hint plans a broadcast hash join") {
    val p = plan("op_join_hint")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pl_cdc_apply: last-change-per-key plans map-side WindowGroupLimit") {
    val p = plan("pl_cdc_apply")
    assert(p.contains("WindowGroupLimit"),
      s"rk=1 filter should plan per-group top-k so one row per key per mapper reaches the exchange:\n$p")
  }

  test("pl_incremental_agg: merge never re-joins, single union of partials") {
    val p = plan("pl_incremental_agg")
    assert(!p.contains("Join"), s"partial merge must be union+agg, not a join:\n$p")
    assert(p.contains("Union"), p)
  }

  test("pl_decontaminate: bench n-grams broadcast, no train-side shuffle before the join") {
    val p = plan("pl_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark 8-gram set must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("pl_decontaminate_spans: probe trigrams broadcast, no cartesian") {
    val p = plan("pl_decontaminate_spans")
    assert(p.contains("BroadcastHashJoin"),
      s"probe trigram set must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ext_ann_hamming: per-query ranking plans map-side WindowGroupLimit") {
    val p = plan("ext_ann_hamming")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k should plan per-group top-k so only k rows per query per mapper shuffle:\n$p")
    // the query side is the broadcast side; the signature scan never shuffles wide
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }
}
