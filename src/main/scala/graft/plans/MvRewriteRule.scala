package graft.plans

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DecimalType

import graft.sources.{GraftDiskCatalog, GraftDiskTable}

/** Transparent materialized-view query rewrite — the optimizer half of the
  * incremental-MV stack ([[graft.ops.CdcMvOps]] is the maintenance half).
  *
  * When a query aggregates a gdisk table in exactly a registered MV's shape
  * (`SELECT keys..., count(*), sum(value) FROM src GROUP BY keys`) and the
  * MV is provably FRESH for the snapshot the query scans, the whole
  * Aggregate collapses to a projection over the MV's serving rows — at
  * 100 TB that is the difference between re-aggregating the corpus and
  * reading a rollup that is orders of magnitude smaller. The reference
  * engine has no MV surface at all; on the Spark side this is the
  * idiomatic route: a `Rule[LogicalPlan]` in the operator-optimization
  * batch (injected via `SparkSessionExtensions`), running BEFORE V2 scan
  * pushdown so the substituted relation still gets its own
  * pushdown/pruning/stats treatment.
  *
  * Soundness gates (any failing check declines — the query then runs
  * against the source, never wrong, just slower):
  *   - structural: Aggregate directly over the source's
  *     `DataSourceV2Relation` (a bare column-pruning Project in between is
  *     unwrapped; any Filter or computed projection declines);
  *   - shape: every grouping expression is a source column matching the
  *     MV's key set exactly (any order); every output maps to a key,
  *     `count(*)`, or `sum` of the MV's value expression (compared
  *     semantically after resolving the stored SQL against the relation);
  *   - types: key columns' data types match the MV's (an MV created
  *     before a source ALTER declines rather than mis-typing);
  *   - freshness: the MV's `graft.mv.applied` hint — landed by REFRESH as
  *     a separate metadata commit AFTER its MERGE, so it only ever
  *     UNDER-states freshness — must equal the version of the snapshot
  *     the query's relation actually scans (this also makes `VERSION AS
  *     OF` queries rewritable when the MV applied exactly that version).
  *
  * The rewrite serves tombstone-filtered rows (`cnt > 0`) and preserves
  * the Aggregate's output attribute ids, so parent operators re-resolve
  * nothing. Disable with `spark.graft.mv.autoRewrite=false`.
  */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get("spark.graft.mv.autoRewrite", "true") != "true") return plan
    // tree-pattern pruning: subtrees without an Aggregate are never
    // traversed, so the rule costs ~nothing on the vast majority of
    // plans (it sits in the operator-optimization FIXPOINT batch)
    plan.transformUpWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.AGGREGATE)) {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        tryRewrite(groupings, aggExprs, child).getOrElse(agg)
    }
  }

  private def tryRewrite(
      groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    // cheap structural gates first — the metadata lookups below only run
    // for plans that already look like an MV shape
    val rel = child match {
      case r: DataSourceV2Relation => r
      case Project(pl, r: DataSourceV2Relation)
          if pl.forall(_.isInstanceOf[AttributeReference]) => r
      case _ => return None
    }
    val srcTable = rel.table match {
      case t: GraftDiskTable => t
      case _ => return None
    }
    val groupAttrs = groupings.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None
    val srcName = for {
      cat <- rel.catalog
      id <- rel.identifier
    } yield s"${cat.name}.${(id.namespace :+ id.name).mkString(".")}"
    val src = srcName.getOrElse(return None)

    MvRewrite.definitionsFor(src).foreach { d =>
      rewriteWith(d, src, srcTable, rel, groupAttrs, aggExprs) match {
        case some @ Some(_) => return some
        case None => ()
      }
    }
    None
  }

  private def rewriteWith(
      d: MvRewrite.MvDef,
      src: String,
      srcTable: GraftDiskTable,
      rel: DataSourceV2Relation,
      groupAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    // key set must match the grouping set exactly (any order)
    if (groupAttrs.length != d.keys.length) return None
    val keyFor: Map[ExprId, String] = groupAttrs.flatMap { a =>
      d.keys.find(_.equalsIgnoreCase(a.name)).map(a.exprId -> _)
    }.toMap
    if (keyFor.size != d.keys.length) return None

    // the stored value expression, resolved against THIS relation's output
    val resolvedValue = Try {
      var ok = true
      val e = spark.sessionState.sqlParser.parseExpression(d.valueSql)
        .transformUp {
          case u: UnresolvedAttribute =>
            rel.output.find(_.name.equalsIgnoreCase(u.name)) match {
              case Some(a) => a
              case None => ok = false; u
            }
        }
      if (ok) Some(e) else None
    }.toOption.flatten.getOrElse(return None)
    def stripTz(e: Expression): Expression =
      e.transform { case c: Cast => c.copy(timeZoneId = None) }
    val expectedSum = stripTz(Cast(resolvedValue, DecimalType(18, 2)))
    def sumMatches(c: Expression): Boolean = {
      val n = stripTz(c)
      n.semanticEquals(expectedSum) ||
        (c.dataType == DecimalType(18, 2) && n.semanticEquals(stripTz(resolvedValue)))
    }

    // freshness: the hint must name exactly the version this query scans
    val cat = GraftDiskCatalog.instance(d.cat).getOrElse(return None)
    val mvIdent = Identifier.of(d.ns.toArray, d.name)
    val mvTable = Try(cat.loadTable(mvIdent)).toOption match {
      case Some(t: GraftDiskTable) => t
      case _ => return None
    }
    val applied = Option(mvTable.properties().get("graft.mv.applied"))
      .flatMap(v => Try(v.toLong).toOption).getOrElse(return None)
    if (Try(srcTable.version().toLong).toOption != Some(applied)) return None

    val mvRel = DataSourceV2Relation.create(mvTable, Some(cat), Some(mvIdent))
    def mvAttr(n: String): Option[AttributeReference] =
      mvRel.output.collectFirst {
        case a: AttributeReference if a.name.equalsIgnoreCase(n) => a
      }
    val cntAttr = mvAttr("cnt").getOrElse(return None)
    val totalAttr = mvAttr("total").getOrElse(return None)
    if (totalAttr.dataType != DecimalType(18, 2)) return None

    // a grouping column: same-typed MV key, nullability tightened back to
    // the source attribute's so the plan's output contract is unchanged
    def keyExpr(a: AttributeReference): Option[Expression] =
      for {
        k <- keyFor.get(a.exprId)
        m <- mvAttr(k) if m.dataType == a.dataType
      } yield if (!a.nullable && m.nullable) KnownNotNull(m) else m

    // recursive: `CAST(sum(x) AS DOUBLE)`-style wrappers around the
    // aggregates map through; any leaf that is neither a grouping column,
    // a supported aggregate, nor a literal declines the whole rewrite
    def mapExpr(e: Expression): Option[Expression] = e match {
      case a: AttributeReference => keyExpr(a)
      case ae: AggregateExpression
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count if c.children.length == 1 &&
              c.children.head.isInstanceOf[Literal] &&
              c.children.head.asInstanceOf[Literal].value != null =>
            Some(KnownNotNull(cntAttr)) // MERGE always writes cnt
          case s: Sum if sumMatches(s.child) =>
            Some(Cast(totalAttr, ae.dataType)) // DecimalType(28,2) widen
          case _ => None
        }
      case l: Literal => Some(l)
      case other if other.children.nonEmpty =>
        val kids = other.children.map(mapExpr)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }
    val mapped = aggExprs.map {
      case a: AttributeReference =>
        keyExpr(a).map(m => Alias(m, a.name)(exprId = a.exprId))
          .getOrElse(return None)
      case al @ Alias(inner, name) =>
        mapExpr(inner).map(m => Alias(m, name)(exprId = al.exprId))
          .getOrElse(return None)
      case _ => return None
    }
    Some(Project(mapped,
      Filter(GreaterThan(cntAttr, Literal(0L)), mvRel)))
  }
}

/** MV-definition discovery + the session hook. Definitions are read from
  * gdisk manifests (`graft.mv.*` properties, persisted by CREATE
  * MATERIALIZED VIEW), cached for a few seconds per JVM — the FRESHNESS
  * check is never cached (it re-reads the MV manifest per query). */
object MvRewrite {
  final case class MvDef(cat: String, ns: Seq[String], name: String,
      src: String, keys: Seq[String], valueSql: String)

  private val TtlNanos = 10L * 1000 * 1000 * 1000
  @volatile private var cache: Option[(Long, Seq[MvDef])] = None

  /** Drop the definition cache (CREATE MATERIALIZED VIEW calls this so a
    * new MV is discoverable immediately). */
  def invalidate(): Unit = cache = None

  private[plans] def definitionsFor(src: String): Seq[MvDef] =
    allDefinitions().filter(_.src.equalsIgnoreCase(src))

  private def allDefinitions(): Seq[MvDef] = {
    val now = System.nanoTime()
    cache match {
      case Some((at, defs)) if now - at < TtlNanos => defs
      case _ =>
        val defs = scanCatalogs()
        cache = Some((now, defs))
        defs
    }
  }

  /** Discovery reads the `_graft_mv/` marker dir — one listing + one
    * loadTable per REGISTERED MV (O(#MVs)), never a manifest sweep of
    * every table in the catalog. A stale marker (MV dropped) is swept
    * best-effort and skipped. */
  private def scanCatalogs(): Seq[MvDef] =
    GraftDiskCatalog.allInstances.flatMap { case (catName, cat) =>
      Try {
        cat.listMvIdents().flatMap { id =>
          Try(cat.loadTable(id)).toOption match {
            case Some(t: GraftDiskTable)
                if t.properties().containsKey("graft.mv.src") =>
              val p = t.properties()
              Some(MvDef(catName, id.namespace.toSeq, id.name,
                p.get("graft.mv.src"),
                p.get("graft.mv.keys").split(',').map(_.trim).toSeq,
                p.get("graft.mv.value")))
            case _ => cat.dropMvMarker(id); None
          }
        }
      }.getOrElse(Nil)
    }
}
