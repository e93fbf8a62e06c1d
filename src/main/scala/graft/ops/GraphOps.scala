package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (from Jaccard/MinHash/SimHash candidates) into duplicate CLUSTERS
  * with one canonical keeper per cluster. A training-data pipeline dedups by
  * cluster, not by pair: pair (a,b) + pair (b,c) must retire both b and c.
  *
  * Algorithm: iterative minimum-label propagation. Every vertex starts
  * labeled with itself; each round every vertex takes the min label over
  * itself and its neighbors; at fixpoint the label IS the component minimum.
  * Each round is one shuffle-join (edges × labels) plus one groupBy-min —
  * both map-side combinable, nothing on the driver but the one-row
  * convergence count. Rounds needed = graph diameter; dedup-cluster graphs
  * are near-cliques (diameter ≤ 3-4 in practice), so this beats the
  * O(log n)-round alternating small-star/large-star construction (Kiveris
  * et al., "Connected Components in MapReduce and Beyond") on constant
  * factors; swap that in for adversarially long path graphs.
  *
  * `localCheckpoint` per round truncates the lineage so the plan does not
  * grow with iteration count (same discipline as BpeOps / IvfOps).
  */
object GraphOps {

  /** Min-label fixpoint over the symmetric edge list, seeded from `seed`
    * (one (id, component=id) row per SEEDED vertex). Labels flow along
    * edges each round; non-seed endpoints acquire labels by propagation
    * exactly as before. Convergence is detected by a (row count, label
    * sum) probe on the checkpointed next table — labels only ever
    * decrease and rows only ever appear, so (count, sum) unchanged ⇔
    * fixpoint — ONE tiny aggregate per round instead of the former
    * next×old join+count (a full extra shuffle per round). */
  private def minLabelFixpoint(
      sym: DataFrame, seed: DataFrame): DataFrame = {
    // the one-row (count, sum) probe is EXACT only for numeric labels
    // (monotone-decreasing labels make the sum strictly decrease on any
    // change); for any other id type the decimal cast is null and the
    // probe would degenerate to a row count — those callers get the exact
    // per-round changed-row check instead (one left_anti + isEmpty over
    // the label table, the pre-r12 shape, paid only on the rare
    // non-numeric path)
    val numericIds = seed.schema("component").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    var labels = seed.localCheckpoint()
    def probe(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(col("component").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var state = if (numericIds) probe(labels) else null
    var converged = false
    while (!converged) {
      // neighbor labels flow along every (symmetric) edge
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("component"))
      val next = labels.union(prop)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      if (numericIds) {
        val nextState = probe(next)
        converged = nextState == state
        state = nextState
      } else {
        converged = next
          .join(labels, Seq("id", "component"), "left_anti").isEmpty
      }
      labels = next
    }
    labels
  }

  /** Components of the undirected graph given by `edges` (cols `src`, `dst`)
    * over `vertices` (col `id`). Returns (id, component) where component is
    * the minimum vertex id in the component. Isolated vertices keep their
    * own id.
    *
    * The fixpoint iterates ONLY over vertices that are edge endpoints —
    * isolated vertices (the overwhelming majority of a lightly-duplicated
    * corpus) can never change label, so they skip every propagation round
    * and rejoin the result at the end. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    // materialize the (possibly expensive) edge pipeline ONCE — every
    // propagation round re-scans it, and without this a jaccard/LSH
    // candidate join upstream would recompute per round
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val endpoints = sym.select(col("src").as("id")).distinct()
    val seed = vertices.select(col("id"))
      .join(endpoints, Seq("id"), "left_semi")
      .select(col("id"), col("id").as("component"))
    val labels = minLabelFixpoint(sym, seed)
    val isolated = vertices.select(col("id"))
      .join(endpoints, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    labels.union(isolated)
  }

  /** Duplicate clusters from a near-dup pair list: every doc mapped to the
    * min doc id of its duplicate group. Docs with no near-dup partner map to
    * themselves. Output one row per doc in a non-singleton cluster:
    * (doc_id, cluster_id, is_keeper).
    *
    * Every pair (a, b) has a ≠ b, so every edge endpoint is in a
    * non-singleton component by construction — the fixpoint label table
    * (seeded from endpoints only) IS the answer, and the former
    * component-size aggregate + join existed solely to drop isolated
    * vertices the endpoint seeding never admits. */
  def dedupClusters(docs: DataFrame, docId: Column, pairs: DataFrame,
      idA: Column, idB: Column): DataFrame = {
    val edges = pairs.select(idA.as("src"), idB.as("dst"))
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val seed = docs.select(docId.as("id"))
      .join(sym.select(col("src").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id"), col("id").as("component"))
    minLabelFixpoint(sym, seed)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("is_keeper"))
  }

  /** Fixed-iteration PageRank over the undirected graph given by `edges`
    * (cols `src`, `dst`) — the centrality score a crawl/corpus pipeline
    * uses to weight documents by link authority (the original web-scale
    * MapReduce workload). Vertices are the edge endpoints; each edge
    * contributes both directions, so every vertex has outdeg ≥ 1 and there
    * is no dangling mass. Each iteration is ONE shuffle-join (edges ×
    * current ranks, both keyed by src) plus one map-side-combinable
    * groupBy-sum; per-round `localCheckpoint` keeps the plan flat
    * (iteration discipline of [[connectedComponents]]). Only the vertex
    * COUNT touches the driver. Fixed `iters` (not convergence-tested) keeps
    * the result a pure function of the graph — engine-independent, so a SQL
    * oracle can unroll the same iterations.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val sym0 = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val deg = sym0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // outdeg is a per-round constant: attach it to the edge list ONCE so
    // every iteration is a single join + aggregate instead of two joins
    // (the degree join repeated per round moved nothing new)
    val sym = sym0.join(deg, Seq("src"))
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    val verts = sym0.select(col("src").as("id")).distinct()
    val n = verts.count().toDouble
    var ranks = verts.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = sym.join(ranks, sym("src") === ranks("id"))
        .select(sym("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
      ranks = contrib.groupBy(col("id"))
        .agg((lit((1 - damping) / n) + lit(damping) * sum(col("c"))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Triangle count per vertex over the undirected graph given by `edges`
    * (cols `src`, `dst`) — the clustering-coefficient numerator, the
    * standard density signal for near-dup cluster QUALITY (a clique-like
    * dup group triangulates heavily; a chain of borderline matches does
    * not). The classic two-join MapReduce shape with the degree-ordering
    * optimization: orient each edge low→high degree (ties by id), so every
    * triangle is counted exactly once and no reducer sees more than
    * O(m^1.5) wedge candidates (Suri & Vassilvitskii, "Counting Triangles
    * and the Curse of the Last Reducer", WWW 2011) — the hot-vertex wedge
    * explosion never materializes because wedges pivot only on LOW-degree
    * vertices. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    // orient: keep (a, b) only when (deg, id) of a < (deg, id) of b; carry
    // the dst's degree so wedge endpoints can be compared in the SAME
    // total order (comparing by id alone would miss triangles whose
    // closing edge is oriented against the id order)
    val oriented = sym
      .join(deg.select(col("v").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("v").as("dst"), col("d").as("dt")), Seq("dst"))
      .filter(col("ds") < col("dt") ||
        (col("ds") === col("dt") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("dt"))
      .localCheckpoint()
    // wedges pivot on the lowest-ranked vertex; close against an oriented
    // edge — which exists iff the graph edge exists, since the wedge's
    // endpoint order matches the orientation order. Wedges come from
    // per-pivot adjacency-list 2-combinations (the posting-list shape the
    // dedup candidate generators use: one hash aggregation + codegen'd
    // combinations instead of a sort-merge self-join re-scanning the
    // oriented edges). The list is sorted by (dt, dst) — the SAME total
    // order the old join predicate compared — so the wedge set is
    // identical; per-pivot list length is bounded by the orientation's
    // O(√m) out-degree cap (Suri & Vassilvitskii), so no aggregation row
    // can blow up.
    val wedges = oriented
      .groupBy(col("src"))
      .agg(array_sort(collect_list(struct(col("dt"), col("dst")))).as("lst"))
      .filter(size(col("lst")) >= 2)
      .select(col("src").as("pivot"),
        explode(DedupOps.postingPairs(col("lst"))).as("p"))
      .select(col("pivot"), col("p.a.dst").as("a"), col("p.b.dst").as("b"))
    val triangles = wedges.join(oriented.as("e3"),
      col("a") === col("e3.src") && col("b") === col("e3.dst"))
    // each triangle increments all three corners
    triangles.select(col("pivot").as("id"))
      .union(triangles.select(col("a").as("id")))
      .union(triangles.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
  }

  /** [[dedupClusters]] with a QUALITY-chosen keeper — the production
    * retirement rule ("keep the best copy", not the arbitrary min-id one).
    * Keeper per cluster = highest `quality`, ties broken by lowest id
    * (deterministic). One extra component-keyed window over the cluster
    * rows — cost proportional to duplicate rows only, not the corpus. */
  def dedupClustersBy(docs: DataFrame, docId: Column, quality: Column,
      pairs: DataFrame, idA: Column, idB: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("q").desc, col("doc_id"))
    dedupClusters(docs, docId, pairs, idA, idB)
      .join(docs.select(docId.as("doc_id"), quality.as("q")), Seq("doc_id"))
      .withColumn("is_keeper", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("q").as("quality"),
        col("is_keeper"))
  }
}
