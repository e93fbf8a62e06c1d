package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.sources.Tables

/** Scratch profiling harness (not part of the correctness suite — run
  * explicitly with testOnly graft.ProfileScratch). */
class ProfileScratch extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  test("jaccard breakdown", org.scalatest.Tag("profile")) {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    time("warmup count")(docs.count())
    val sh = docs.select($"doc_id".as("id"), TextOps.shingles($"text", 3).as("sh"))
    time("shingles only")(sh.count())
    val idx = sh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    time("explode")(idx.count())
    val a = idx.select(col("id").as("id_a"), col("sz").as("sz_a"), col("shingle"))
    val b = idx.select(col("id").as("id_b"), col("sz").as("sz_b"), col("shingle"))
    val joined = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
    time("self join")(joined.count())
    val agg = joined.groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
    time("group")(agg.count())
    time("full jaccardPairs")(
      DedupOps.jaccardPairs(docs, $"doc_id", $"text", 3, 0.8).count())
    time("full jaccardPairs again")(
      DedupOps.jaccardPairs(docs, $"doc_id", $"text", 3, 0.8).count())
    time("minhash")(
      DedupOps.minhashLshPairs(docs, $"doc_id", $"text", 3, 16, 4, 0.8).count())
    time("embedding pairs")(
      DedupOps.embeddingTopPairs(
        Tables.load(spark, TestSpark.sfDir, "embeddings"), $"vec_id", $"embedding", 20).count())
  }

  test("q5 at sf0.1 in isolation", org.scalatest.Tag("profile")) {
    val q5 = graft.queries.Registry.queries("q5_local_supplier")
    time("q5 sf0.1 cold")(q5(spark, "/root/testdata/sf0.1").count())
    time("q5 sf0.1 warm")(q5(spark, "/root/testdata/sf0.1").count())
    time("q7 sf0.1 cold")(
      graft.queries.Registry.queries("q7_volume_shipping")(spark, "/root/testdata/sf0.1").count())
  }

  test("tpch bench outliers sf0.1", org.scalatest.Tag("profile")) {
    val names = Seq("q3_shipping_priority", "q4_order_priority",
      "q18_large_orders", "q21_late_shippers")
    for (n <- names; pass <- Seq("cold", "warm"))
      time(s"$n $pass")(
        graft.queries.Registry.queries(n)(spark, "/root/testdata/sf0.1").count())
  }

  test("recursive cte probe", org.scalatest.Tag("profile")) {
    try {
      val df = spark.sql("""WITH RECURSIVE r(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 10)
        SELECT n FROM r ORDER BY n""")
      println("[profile] RECURSIVE-OK " + df.collect().map(_.get(0)).mkString(","))
    } catch {
      case e: Exception => println("[profile] RECURSIVE-FAIL " + e.getMessage.take(200))
    }
  }

  test("q21 plan", org.scalatest.Tag("profile")) {
    val df = graft.queries.Registry.queries("q21_late_shippers")(spark, "/root/testdata/sf0.1")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("[profile] q21 join nodes:")
    plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
      l.contains("HashAggregate") || l.contains("Sort ")).foreach(l => println("  " + l.take(160)))
  }

  test("jaccard plan exchange reuse", org.scalatest.Tag("profile")) {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val df = DedupOps.jaccardPairs(docs, $"doc_id", $"text", 3, 0.8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("[profile] ReusedExchange present: " + plan.contains("ReusedExchange"))
    println("[profile] num Exchange nodes: " +
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println("[profile] ShuffleQueryStage ids: " +
      "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toList)
    val finalSection = plan.split("== Initial Plan ==")(0)
    println("[profile] final: exchanges=" +
      finalSection.linesIterator.count(_.contains("Exchange hashpartitioning")) +
      " stages=" + "ShuffleQueryStage (\\d+)".r.findAllMatchIn(finalSection).map(_.group(1)).toList +
      " reused=" + finalSection.contains("ReusedQueryStage"))
  }
}
