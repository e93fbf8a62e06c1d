package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfOps, SimilarityOps, SkewOps}
import graft.sources.Tables

/** Scale-path operators: salting equals the unsalted results; IVF achieves
  * useful recall against brute force while scanning a fraction of cells. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skewed = {
    // one hot key (90%) + uniform tail — decimal values so sums are exact
    val hot = (1 to 900).map(i => ("hot", BigDecimal(i).setScale(2)))
    val tail = (1 to 100).map(i => (s"k${i % 10}", BigDecimal(i).setScale(2)))
    (hot ++ tail).toDF("key", "value")
      .withColumn("value", col("value").cast(DecimalType(12, 2)))
  }

  test("salted aggregation equals plain groupBy on a hot key") {
    val plain = skewed.groupBy($"key")
      .agg(sum($"value").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedSum(skewed, $"key", $"value", salts = 8)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on a hot key") {
    val dim = Seq(("hot", 1), ("k1", 2), ("k5", 3)).toDF("dkey", "attr")
    val plain = skewed.join(dim, $"key" === $"dkey")
      .groupBy($"dkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewOps.saltedJoin(skewed, dim, "key", "dkey", salts = 8)
      .groupBy($"dkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("IVF top-k achieves useful recall scanning nprobe/numCells of data") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()
    val brute = SimilarityOps.bruteForceTopK(
        emb.filter($"vec_id" < 10), emb, $"vec_id", $"embedding", $"vec_id", $"embedding", 5)
      .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = IvfOps.ivfTopK(
        emb.filter($"vec_id" < 10), emb, $"vec_id", $"embedding", $"vec_id", $"embedding",
        k = 5, numCells = 16, nprobe = 6)
      .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
  }

  test("IVF is deterministic run-to-run") {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    def run() = IvfOps.ivfTopK(
        emb.filter($"vec_id" < 3), emb, $"vec_id", $"embedding", $"vec_id", $"embedding",
        k = 3, numCells = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("AQE splits a skewed sort-merge join with no manual salting") {
    // The runtime complement to SkewOps.saltedJoin: at 100 TB the FIRST
    // line of defense against a hot key is AQE's skew-join split — salting
    // is for the keys AQE can't see (e.g. inside an aggregation). Thresholds
    // are forced tiny so the fixture-scale hot partition qualifies.
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
      val hot = spark.range(300000).select(lit(0L).as("k"), $"id".as("v"))
        .unionAll(spark.range(1000)
          .select(($"id" % 50 + 1).as("k"), $"id".as("v")))
      val dim = spark.range(51).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = hot.join(dim, "k")
      // execute THIS queryExecution (count() would plan a separate one and
      // leave this AdaptiveSparkPlan unfinalized)
      assert(joined.queryExecution.toRdd.count() == 301000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("memory pressure: heavy pipeline entries complete by SPILLING in a 1g-heap JVM") {
    // the at-scale behavior the 128 GiB bench never exercises: fork a REAL
    // small-heap JVM (not a conf tweak on this one) whose session forces
    // the element-count spill triggers, and run the heaviest pipeline
    // entries end-to-end — completion + spilledBytes>0 proves the
    // aggregates/sorts/joins/windows take their spill paths instead of
    // OOMing. Classpath and --add-opens are inherited from this forked
    // test JVM (same launcher configuration).
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    // sf0.1, not the suite's sf0.001: the r12 posting-list rewrite
    // removed the window/SMJ buffers whose element-count thresholds used
    // to force synthetic spills on fixture-sized data; the probe now
    // proves REAL memory-pressure spilling (spark.testing.memory caps
    // the pool at ~30 MB execution), which needs the 1.4M-row shingle
    // index only sf0.1 provides (~0.5 GB actually spills, ~30 s).
    // The directory is the suite fixture root's sf0.1 sibling (no
    // hardcoded machine layout); absent => cancel, not fail.
    val sf01 = java.nio.file.Paths.get(TestSpark.sfDir).getParent
      .resolve("sf0.1").toString
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf01)),
      s"sf0.1 fixture not found at $sf01 — skipping the forked spill probe")
    val cmd = Seq(javaBin, "-Xmx1g", "-cp", System.getProperty("java.class.path")) ++
      addOpens ++ Seq("graft.SpillProbe", sf01)
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    val exit = proc.waitFor()
    val text = out.toString
    assert(exit == 0, s"spill probe exited $exit:\n${text.takeRight(3000)}")
    val ok = text.linesIterator.find(_.startsWith("SPILL_PROBE_OK"))
    assert(ok.isDefined, text.takeRight(3000))
    val spilledBytes = "spilledBytes=(\\d+)".r.findFirstMatchIn(ok.get)
      .map(_.group(1).toLong).getOrElse(0L)
    assert(spilledBytes > 0, s"expected actual spills, got: ${ok.get}")
  }
}
