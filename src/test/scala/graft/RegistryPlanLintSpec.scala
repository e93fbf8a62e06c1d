package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Registry-WIDE plan lint: every registered query's optimized plan is swept
  * for the two shapes that become scale cliffs at 100 TB no matter how
  * correct the result is —
  *
  *   1. a non-equi join where NEITHER side is provably bounded
  *      (pair blowup: O(n·m) rows in flight), and
  *   2. a window with an empty partitionSpec over unbounded input
  *      (every row through ONE task).
  *
  * "Provably bounded" is structural, not name-based: the logical plan's
  * `maxRows` is defined only by constructs whose cardinality cannot grow
  * with the data — global aggregates (1 row), LIMIT k, VALUES, range(n) —
  * so a crossJoin against a corpus-stats aggregate or a post-top-k window
  * passes automatically, while a scan×scan cartesian can never sneak
  * through. The per-query guards in [[PlanSpec]] pin the plans we designed;
  * this sweep is the safety net for the other ~270 queries and every future
  * one: a new registry entry that cartesians two unbounded inputs or
  * funnels an unbounded stream into a single window task fails the build
  * unless allowlisted here WITH a reason.
  *
  * Iterative / checkpointing builds (connected components, PageRank, BPE,
  * k-means-trained ANN, persisted indexes) are skipped: their lineage is
  * localCheckpoint-truncated to a LogicalRDD, so there is nothing left to
  * lint — their plan discipline is asserted by their dedicated specs
  * instead ([[PlanSpec]], GraphOpsSpec, IvfIndexSpec, ...).
  */
class RegistryPlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Non-equi joins over inputs `maxRows` can't prove bounded, each bounded
    * by construction — the reason is the data-independent cardinality cap. */
  private val nonEquiAllowed: Map[String, String] = Map(
    "ext_ann_bruteforce" -> "documented all-pairs oracle anchor (IVF/LSH are the scale paths)",
    "ext_dedup_embedding_pairs" -> "documented all-pairs oracle anchor",
    "ext_ann_hamming" -> "k fixed query signatures ride the broadcast; corpus scans once",
    "ext_ann_maxsim" -> "k fixed query token-matrices ride the broadcast; corpus scans once",
    "op_join_nonequi" -> "theta-join operator surface itself",
    "op_join_cross" -> "cross-join operator surface itself",
    "op_lateral_join" -> "lateral correlated subquery surface itself",
    "an_market_basket" -> "self-join of per-order DISTINCT brands: brand vocabulary grain",
    "an_ks_test_lengths" -> "band join on distinct-length grain (bounded value domain)",
    "ext_fuzzy_key_join" -> "deletion-neighborhood keys are equi; residual edit-verify only",
    "ext_events_range_join" -> "binned equi-join; residual range predicate only",
    "ext_sketch_theta_overlap" -> "pairwise crossJoin of per-SOURCE sketches: source grain, O(sketch) rows",
    "ext_ann_maxsim_pruned" -> "k fixed query signatures broadcast for the Hamming prefilter; corpus scans once",
    "ext_embed_dim_ablation" -> "fixed query panel broadcast, scored per kept-dimension variant; corpus scans once per variant",
    "ext_retrieval_eval" -> "fixed evaluation query panel broadcast; brute-force IS the metric's ground truth",
    "ext_ann_recall_report" -> "recall evaluation needs the exact ranking as ground truth: fixed query panel broadcast, corpus scans once; LSH side is equi-bucketed")

  /** Windows with empty partitionSpec whose input grain is bounded by a
    * data-independent domain rather than a `maxRows`-provable construct. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "pl_token_budget_alloc" -> "per-source allocation: rows = #sources",
    "an_ks_test_lengths" -> "distinct-lengths CDF: rows = #distinct lengths",
    "pl_sample_weighted" -> "window runs post-TakeOrdered top-k (bounded by k)")

  /** Builds that train/iterate/write at build time; plan is checkpoint-
    * truncated (LogicalRDD) or side-effecting — linted by dedicated specs. */
  private val skipBuild: Set[String] = Set(
    "ext_dedup_clusters", "ext_dedup_clusters_best", "ext_dedup_keeper_map",
    "ext_graph_component_sizes", "ext_graph_pagerank", "ext_graph_triangles",
    "ext_ml_hashed_lr", "ext_ml_calibration",
    "ext_bpe_merges", "ext_bpe_token_counts",
    "ext_ann_ivf", "ext_ann_ivf_persisted", "ext_ann_ivfpq", "ext_ann_pq",
    "ext_ann_knn_graph", "pl_semdedup", "ext_embed_pca",
    "pl_incremental_dedup_persisted", "pl_dedup_cascade",
    "pl_rag_index", "pl_rag_rerank")

  /** Cardinality provably capped by a data-independent construct (global
    * aggregate → 1 row, LIMIT k, VALUES, range(n)). */
  private def bounded(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1000000L)

  /** At least one TOP-LEVEL conjunct equates an expression from each side.
    * Only conjuncts count: an equality nested under Not/Or (e.g. the
    * `vec_id <> qid` of a broadcast-scoring cross join) is NOT an equi key
    * and must not exempt the join. */
  private def conjuncts(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def hasEquiKey(j: Join): Boolean = j.condition.exists { c =>
    conjuncts(c).exists {
      case e @ (_: EqualTo | _: EqualNullSafe) =>
        val b = e.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BinaryExpression]
        val (l, r) = (b.left.references, b.right.references)
        l.nonEmpty && r.nonEmpty &&
          ((l.subsetOf(j.left.outputSet) && r.subsetOf(j.right.outputSet)) ||
            (r.subsetOf(j.left.outputSet) && l.subsetOf(j.right.outputSet)))
      case _ => false
    }
  }

  test("registry sweep: no unbounded cartesian joins or global windows") {
    val violations = Seq.newBuilder[String]
    for (d <- Registry.queryDefs if !skipBuild(d.name)) {
      val opt = d.build(spark, TestSpark.sfDir).queryExecution.optimizedPlan
      val badJoin = opt.collectFirst {
        case j: Join
            if !hasEquiKey(j) && !bounded(j.left) && !bounded(j.right) => j
      }.isDefined
      if (badJoin && !nonEquiAllowed.contains(d.name))
        violations += s"${d.name}: non-equi join, neither side provably bounded"
      val badWindow = opt.collectFirst {
        case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) => w
      }.isDefined
      if (badWindow && !globalWindowAllowed.contains(d.name))
        violations += s"${d.name}: unpartitioned window over unbounded input"
    }
    val v = violations.result()
    assert(v.isEmpty, s"${v.size} plan-lint violations:\n" + v.mkString("\n"))
  }
}
