package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SketchOps
import graft.queries.Registry
import graft.sources.Tables

/** HLL sketch correctness properties: estimates track exact distinct counts
  * within the sketch's error bound, and a union OF SKETCHES (the persisted
  * pre-aggregation path — raw keys never re-scanned) estimates the same
  * count as sketching the raw union directly.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events =
    Tables.load(spark, TestSpark.sfDir, "events").cache()

  test("per-group HLL estimates are within 2% of exact distinct counts") {
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SketchOps.hllSketches(events, $"event_type", $"user_id")
      .select($"grp", SketchOps.estimate($"sketch").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, ex) =>
      val err = math.abs(approx(g) - ex).toDouble / ex
      assert(err <= 0.02, s"group $g: exact=$ex approx=${approx(g)} err=$err")
    }
  }

  test("sketch union equals sketching the union; parquet roundtrip merges") {
    val perType = SketchOps.hllSketches(events, $"event_type", $"user_id")
    val direct = events
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sketch"))
      .select(SketchOps.estimate($"sketch")).head.getLong(0)
    val merged = SketchOps.hllUnion(perType, $"sketch")
      .select(SketchOps.estimate($"sketch")).head.getLong(0)
    assert(merged == direct,
      s"union-of-sketches $merged != direct sketch $direct")

    // persist per-group sketches as binary parquet, read back, re-merge:
    // the incremental-rollup path — no raw data touched after day one
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    perType.write.mode("overwrite").parquet(dir)
    val reread = SketchOps.hllUnion(spark.read.parquet(dir), $"sketch")
      .select(SketchOps.estimate($"sketch")).head.getLong(0)
    assert(reread == direct, s"roundtripped merge $reread != direct $direct")
  }

  test("theta estimates and intersections track exact set arithmetic") {
    import graft.functions.ThetaFunctions._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val sh = docs.select($"source", explode(graft.functions.NativeFunctions
      .word_shingles(graft.ops.TextOps.tokens($"text"), 3)).as("sh")).cache()
    val sources = sh.select($"source").distinct().as[String].collect().sorted
    assert(sources.length >= 2, "fixture needs ≥2 sources")
    val (sa, sb) = (sources(0), sources(1))
    val exactA = sh.filter($"source" === sa).select($"sh").distinct().count()
    val exactB = sh.filter($"source" === sb).select($"sh").distinct().count()
    val exactI = sh.filter($"source" === sa).select($"sh").distinct()
      .intersect(sh.filter($"source" === sb).select($"sh").distinct()).count()
    val sk = SketchOps.thetaSketches(sh, $"source", $"sh")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    def est(b: Array[Byte]) = graft.functions.ThetaOps.estimate(b)
    assert(math.abs(est(sk(sa)) - exactA) / exactA <= 0.05,
      s"$sa exact=$exactA est=${est(sk(sa))}")
    assert(math.abs(est(sk(sb)) - exactB) / exactB <= 0.05,
      s"$sb exact=$exactB est=${est(sk(sb))}")
    val interEst = graft.functions.ThetaOps.intersectEstimate(sk(sa), sk(sb))
    // intersection error bound is relative to the UNION size (theta keeps
    // k min-hashes of each set); allow 5% of the union
    val union = exactA + exactB - exactI
    assert(math.abs(interEst - exactI) <= math.max(0.05 * union, 5.0),
      s"intersection exact=$exactI est=$interEst union=$union")
    // A-not-B (the batch-novelty metric): estimate tracks exact |A \ B|
    val diffEst = graft.functions.ThetaOps.aNotBEstimate(sk(sa), sk(sb))
    val exactD = exactA - exactI
    assert(math.abs(diffEst - exactD) <= math.max(0.05 * union, 5.0),
      s"aNotB exact=$exactD est=$diffEst")
    // set-algebra consistency of the three estimators: |A∩B| + |A\B| ≈ |A|
    // (exact equality in exact mode; bounded by estimation error otherwise)
    assert(math.abs((interEst + diffEst) - est(sk(sa))) <= math.max(0.05 * union, 5.0),
      s"inter+diff=${interEst + diffEst} != |A|=${est(sk(sa))}")
    sh.unpersist()
  }

  test("theta union-of-sketches equals direct sketch; parquet roundtrip") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val sh = docs.select($"source", explode(graft.functions.NativeFunctions
      .word_shingles(graft.ops.TextOps.tokens($"text"), 3)).as("sh"))
    val perSource = SketchOps.thetaSketches(sh, $"source", $"sh")
    val direct = sh.agg(graft.functions.ThetaFunctions
        .theta_sketch_agg($"sh", 12).as("sketch"))
      .select(SketchOps.thetaEstimate($"sketch")).head.getDouble(0)
    val merged = SketchOps.thetaUnion(perSource, $"sketch")
      .select(SketchOps.thetaEstimate($"sketch")).head.getDouble(0)
    // theta union is order-independent (k smallest hashes of the set) —
    // exact equality, not tolerance
    assert(merged == direct, s"union-of-sketches $merged != direct $direct")
    val dir = java.nio.file.Files.createTempDirectory("graft_theta").toString
    perSource.write.mode("overwrite").parquet(dir)
    val reread = SketchOps.thetaUnion(spark.read.parquet(dir), $"sketch")
      .select(SketchOps.thetaEstimate($"sketch")).head.getDouble(0)
    assert(reread == direct, s"roundtripped merge $reread != direct $direct")
  }

  test("ext_sketch_theta_overlap registry entry: sane pairwise matrix") {
    val rows = Registry.queries("ext_sketch_theta_overlap")(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, shared, onlyA) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val j = r.getDouble(6)
      assert(shared <= math.min(na, nb), s"shared $shared > min($na,$nb)")
      assert(j >= 0.0 && j <= 1.0, s"jaccard $j out of range")
      // |A\B| + |A∩B| ≈ |A| (rounded independently → ±1 each)
      assert(math.abs(onlyA + shared - na) <= 2,
        s"only_a $onlyA + shared $shared != n_a $na")
    }
  }

  test("KLL quantiles within rank-error bound of exact; merge tracks direct") {
    import graft.functions.KllFunctions._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select($"source", $"n_chars".cast("double").as("len")).cache()
    val n = docs.count()
    val exactSorted = docs.select($"len").as[Double].collect().sorted
    def exactQ(r: Double): Double = exactSorted(math.min(
      (r * n).toInt, exactSorted.length - 1))
    val sk = docs.agg(kll_sketch_agg($"len", 200).as("sk"))
      .select(kll_quantile($"sk", lit(0.5)).as("p50"),
        kll_quantile($"sk", lit(0.99)).as("p99"),
        kll_rank($"sk", lit(exactQ(0.5))).as("r50"))
      .head()
    // k=200 → normalized rank error ~1.65%; assert the VALUE at the
    // estimated quantile sits within ±3.5% rank of the target
    def rankOf(v: Double): Double =
      exactSorted.count(_ <= v).toDouble / n
    assert(math.abs(rankOf(sk.getDouble(0)) - 0.5) <= 0.035,
      s"p50 est=${sk.getDouble(0)} rank=${rankOf(sk.getDouble(0))}")
    assert(math.abs(rankOf(sk.getDouble(1)) - 0.99) <= 0.035,
      s"p99 est=${sk.getDouble(1)} rank=${rankOf(sk.getDouble(1))}")
    assert(math.abs(sk.getDouble(2) - 0.5) <= 0.035, s"rank(p50)=${sk.getDouble(2)}")

    // merge of per-source sketches answers within bound too (merged sketch
    // retains the KLL guarantee), and parquet roundtrips
    val perSource = SketchOps.kllSketches(docs, $"source", $"len")
    val dir = java.nio.file.Files.createTempDirectory("graft_kll").toString
    perSource.write.mode("overwrite").parquet(dir)
    val merged = SketchOps.kllMerge(spark.read.parquet(dir), $"sketch")
      .select(SketchOps.kllQuantile($"sketch", 0.5)).head.getDouble(0)
    assert(math.abs(rankOf(merged) - 0.5) <= 0.035,
      s"merged p50=$merged rank=${rankOf(merged)}")
    docs.unpersist()
  }

  test("ext_sketch_kll_quantiles registry entry: monotone percentiles, sane ALL") {
    val rows = Registry.queries("ext_sketch_kll_quantiles")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.exists(_._1 == "ALL"))
    rows.foreach { case (scope, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99, s"$scope: $p50/$p90/$p99 not monotone")
    }
    val (_, a50, _, a99) = rows.find(_._1 == "ALL").get
    val others = rows.filter(_._1 != "ALL")
    assert(a50 >= others.map(_._2).min && a50 <= others.map(_._2).max,
      s"ALL p50 $a50 outside per-source range")
    assert(a99 <= others.map(_._4).max, s"ALL p99 $a99 above every source")
  }

  test("CMS never undercounts; overcount within eps*N; merge == direct bytes") {
    import graft.functions.CmsFunctions._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val toks = docs.select($"source",
      explode(graft.ops.TextOps.tokens($"text")).as("tok")).cache()
    val n = toks.count()
    val depth = 5; val width = 4096
    val exact = toks.groupBy($"tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = toks.agg(cms_sketch_agg($"tok", depth, width).as("sketch"))
      .head.getAs[Array[Byte]](0)
    exact.foreach { case (tok, ex) =>
      val est = graft.functions.CmsOps.estimateString(
        sketch, org.apache.spark.unsafe.types.UTF8String.fromString(tok))
      assert(est >= ex, s"CMS undercounted $tok: exact=$ex est=$est")
      // width=4096 → eps = e/width ≈ 6.6e-4; classic bound overcount ≤ eps·N
      // per row with prob 1-delta^depth — all-rows check with 3x headroom
      assert(est - ex <= math.max(3 * 2.72 / width * n, 3.0),
        s"CMS overcount on $tok: exact=$ex est=$est n=$n")
    }
    // absent key: bounded by the same eps·N (usually 0 on a sparse table)
    val absent = graft.functions.CmsOps.estimateString(
      sketch, org.apache.spark.unsafe.types.UTF8String.fromString("zzz_absent"))
    assert(absent <= math.max(3 * 2.72 / width * n, 3.0))
    // merge-of-per-source-sketches == direct sketch, BYTE equality (CMS
    // merge is elementwise add; seeded hashes → deterministic layout)
    val perSource = SketchOps.cmsSketches(toks, $"source", $"tok", depth, width)
    val merged = SketchOps.cmsMerge(perSource, $"sketch", depth, width)
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, sketch),
      "merged sketch bytes differ from direct build")
    // parquet roundtrip preserves the bytes
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    perSource.write.mode("overwrite").parquet(dir)
    val reread = SketchOps.cmsMerge(spark.read.parquet(dir), $"sketch", depth, width)
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(reread, sketch))
    toks.unpersist()
  }

  test("ext_sketch_cms_freq registry entry: est >= exact per row, probes present") {
    val rows = Registry.queries("ext_sketch_cms_freq")(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(est >= exact, s"${r.getString(1)}: est $est < exact $exact")
      assert(over == est - exact)
    }
    // common probes must appear for at least one source
    val toks = rows.map(_.getString(1)).toSet
    assert(toks.contains("the") && toks.contains("data"))
  }

  test("ext_sketch_hll registry entry: ALL row consistent with per-type rows") {
    val rows = Registry.queries("ext_sketch_hll")(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = events.select(countDistinct($"user_id")).head.getLong(0)
    assert(rows.contains("ALL"))
    // the ALL union can never estimate below the largest single group
    val maxGroup = rows.filter(_._1 != "ALL").values.max
    assert(rows("ALL") >= maxGroup)
    val err = math.abs(rows("ALL") - exactAll).toDouble / exactAll
    assert(err <= 0.02, s"ALL: exact=$exactAll approx=${rows("ALL")} err=$err")
  }

  test("ext_sketch_join_card: inner product >= exact join size, within CM bound") {
    val r = Registry.queries("ext_sketch_join_card")(spark, TestSpark.sfDir).head()
    val (exact, est, over, bound) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(est >= exact, s"inner product $est underestimates true join size $exact")
    assert(over == est - exact)
    assert(over <= bound, s"overcount $over exceeds (e/width)*N1*N2 bound $bound")
    // the estimate must carry signal, not just the bound: well under 2x
    // the true size at this width on ~zipfless uniform orderkeys
    assert(est < 2 * exact, s"estimate $est is uselessly loose vs exact $exact")
  }
}
