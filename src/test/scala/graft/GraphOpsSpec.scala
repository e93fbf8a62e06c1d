package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, GraphOps}
import graft.sources.Tables

/** Connected-components correctness: fixpoint label propagation vs
  * hand-computed components, including multi-round convergence (path graph)
  * and the pairs→clusters dedup composition. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("components of a path graph need multiple propagation rounds") {
    // 0-1-2-3-4-5 path (diameter 5) + isolated 9 + separate pair 7-8
    val verts = Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L).toDF("id")
    val edges = Seq((1L, 0L), (1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L), (7L, 8L))
      .toDF("src", "dst")
    val got = GraphOps.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("string-id components converge exactly (non-numeric probe fallback)") {
    // the (count, decimal-sum) convergence probe is null for string ids —
    // the fallback changed-row check must keep iterating through the path
    // graph's multi-round label descent instead of exiting on the first
    // count-stable round with wrong labels
    val verts = Seq("a", "b", "c", "d", "z").toDF("id")
    val edges = Seq(("d", "c"), ("c", "b"), ("b", "a")).toDF("src", "dst")
    val got = GraphOps.connectedComponents(verts, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "z" -> "z"))
  }

  test("dedupClustersBy keeps the highest-quality copy, min id on ties") {
    // cluster {1,2,3}: 2 has top quality; cluster {5,6}: tie -> 5 keeps
    val docs = Seq((1L, 10L), (2L, 99L), (3L, 50L), (4L, 7L), (5L, 20L),
      (6L, 20L)).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = GraphOps.dedupClustersBy(docs, $"doc_id", $"quality",
        pairs, $"id_a", $"id_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got == Map(
      1L -> (1L, false), 2L -> (1L, true), 3L -> (1L, false),
      5L -> (5L, true), 6L -> (5L, false)))
    assert(!got.contains(4L)) // singletons are not duplicate clusters
  }

  test("dedupClusters merges transitively-linked pairs into one cluster") {
    // (a,b) + (b,c) must become one cluster keyed by min id, even though
    // (a,c) is not a pair
    val docs = Seq(10L, 11L, 12L, 13L, 20L).toDF("doc_id")
    val pairs = Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val got = GraphOps.dedupClusters(docs, $"doc_id", pairs, $"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((10L, 10L, true), (11L, 10L, false), (12L, 10L, false)))
  }

  test("random graphs match a union-find reference (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 24
      val edges = (0 until 40).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) parent(find(a.toInt)) = find(b.toInt)
      val want = (0 until n).map { v =>
        v.toLong -> (0 until n).filter(u => find(u) == find(v)).min.toLong
      }.toMap

      val got = GraphOps.connectedComponents(
        (0L until n.toLong).toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("clusters over driver jaccard pairs: every pair lands in one cluster") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val pairs = DedupOps.jaccardPairs(docs, $"doc_id", $"text", 3, 0.8).cache()
    val clusters = GraphOps.dedupClusters(docs, $"doc_id", pairs, $"id_a", $"id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairRows = pairs.select($"id_a", $"id_b").collect()
    assert(pairRows.nonEmpty)
    for (r <- pairRows)
      assert(clusters(r.getLong(0)) == clusters(r.getLong(1)))
    // exactly one keeper per cluster, and it is the min member
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.keys.min)
    for ((cid, minId) <- byCluster) assert(cid == minId)
  }

  test("pageRank matches a sequential reference and conserves total mass") {
    // star 1-{2,3,4} plus pair 5-6: hub 1 must outrank leaves; the
    // undirected graph has no dangling nodes so Σ rank = 1 exactly
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 3, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // sequential reference: same fixed-iteration update
    val sym = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L),
      (5L, 6L), (6L, 5L))
    val outdeg = sym.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val ids = sym.map(_._1).distinct
    val n = ids.size.toDouble
    var r = ids.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until 3) {
      val contrib = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum)
      r = ids.map(id => id -> ((1 - 0.85) / n + 0.85 * contrib(id))).toMap
    }
    assert(got.keySet == r.keySet)
    for ((id, v) <- r) assert(math.abs(got(id) - v) < 1e-12, s"id $id")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert(got(1L) > got(2L) && got(2L) == got(3L))
  }

  test("triangleCounts matches brute force on known and random graphs") {
    // K4 on {1,2,3,4}: every vertex is in C(3,2)=3 triangles; pendant 5
    val k4 = (for { a <- 1 to 4; b <- a + 1 to 4 } yield (a.toLong, b.toLong)) :+ (4L, 5L)
    val got = GraphOps.triangleCounts(k4.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 20
      val edges = (for { a <- 0 until n; b <- a + 1 until n
        if rnd.nextDouble() < 0.2 } yield (a.toLong, b.toLong))
      val adj = edges.toSet
      def linked(a: Long, b: Long) = adj.contains((a min b, a max b))
      val want = (0 until n).map { v =>
        v.toLong -> (for { a <- 0 until n; b <- a + 1 until n
          if a != v && b != v && linked(v, a) && linked(v, b) && linked(a, b)
        } yield 1).size.toLong
      }.filter(_._2 > 0).toMap
      val res = GraphOps.triangleCounts(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(res == want, s"trial $trial")
    }
  }
}
