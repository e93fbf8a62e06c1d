package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental materialized-view maintenance over the gdisk CDC feed —
  * the lakehouse ETL core loop at 100 TB: each refresh reads ONLY the
  * commits since the last applied source version (`table_changes`),
  * folds them into per-key deltas (one groupBy shuffle over the delta,
  * never the corpus), and MERGEs them into the MV (file-granular
  * copy-on-write — untouched MV files stay in place).
  *
  * Exactly-once without a side channel: the applied-version watermark
  * is NOT a property or a state table (either would make "apply delta"
  * and "record progress" two commits, and a crash between them would
  * double-apply). Instead every MERGE stamps the touched rows'
  * `__as_of` column with the source version inside the SAME commit, and
  * the watermark is recovered as `max(__as_of)` over the MV. Zero-count
  * groups are kept as tombstones (served views filter `cnt > 0`) so a
  * delete-heavy refresh can never regress the watermark; a zero-ROW
  * delta window (e.g. OPTIMIZE-only commits) leaves the watermark
  * unmoved, and replaying an empty window is harmless — so a crash at
  * any point re-runs at most one window, and re-running it is a no-op.
  *
  * Reference scope note: the reference engine has no CDC or MV surface
  * (its providers stop at full-table scans, `providers.rs:11-57`);
  * this is extension-layer capability the 100 TB pipeline needs.
  */
object CdcMvOps {

  /** The MV schema contract: key columns (caller-typed), then
    * `cnt BIGINT, total DECIMAL(18,2), __as_of BIGINT`. DECIMAL keeps
    * incremental add/subtract EXACT, so an incrementally-maintained MV
    * is bit-identical to a direct aggregate — double arithmetic would
    * drift in the last ulp under subtraction. */
  def createRollupDdl(mv: String, keyDdl: String): String =
    s"""CREATE TABLE IF NOT EXISTS $mv (
        $keyDdl, cnt BIGINT, total DECIMAL(18,2), __as_of BIGINT)"""

  private[graft] def diskTable(s: SparkSession, name: String): graft.sources.GraftDiskTable = {
    val parts = name.split('.')
    require(parts.length >= 3,
      s"CdcMvOps: '$name' must be <catalog>.<namespace>.<table>")
    val cat = graft.sources.GraftDiskCatalog.instance(parts.head).getOrElse(
      sys.error(s"CdcMvOps: '${parts.head}' is not a registered gdisk catalog"))
    cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(parts.tail.init, parts.last))
      .asInstanceOf[graft.sources.GraftDiskTable]
  }

  /** One refresh step: fold source commits `(watermark, latest]` into
    * the MV. Returns the new watermark (== old when nothing applied).
    * `valueExpr` is a SQL expression over the source columns (cast to
    * DECIMAL(18,2) internally). Cost scales with the DELTA, not the
    * source: one CDC scan of the window's files + one groupBy + one
    * file-granular COW MERGE. */
  def refreshRollup(
      s: SparkSession,
      src: String,
      mv: String,
      keys: Seq[String],
      valueExpr: String): Long = {
    val last = s.sql(s"SELECT coalesce(max(__as_of), 0L) FROM $mv")
      .head().getLong(0)
    val latest = diskTable(s, src).log.latestVersion()
    if (latest <= last) {
      diskTable(s, mv).commitProperty("graft.mv.applied", last.toString)
      return last
    }
    val feed = diskTable(s, src).changes(last + 1, latest)
    // a zero-row window (reorganization/metadata commits only) stamps no
    // rows, so the watermark cannot advance — return the old one and let
    // the harmless replay re-cover the window next time. The MV content
    // is still exact through `latest` (the window folded nothing), so
    // the rewrite hint may advance to it
    if (feed.isEmpty) {
      diskTable(s, mv).commitProperty("graft.mv.applied", latest.toString)
      return last
    }
    val keyList = keys.mkString(", ")
    val view = s"__mv_feed_${Integer.toHexString(mv.hashCode).replace('-', 'n')}"
    feed.createOrReplaceTempView(view)
    s.sql(s"""
      SELECT $keyList,
        sum(CASE WHEN _change_type = 'insert' THEN 1L ELSE -1L END) AS d_cnt,
        sum(CASE WHEN _change_type = 'insert'
                 THEN CAST(($valueExpr) AS DECIMAL(18,2))
                 ELSE -CAST(($valueExpr) AS DECIMAL(18,2)) END) AS d_sum
      FROM $view GROUP BY $keyList""").createOrReplaceTempView(view + "_d")
    val on = keys.map(k => s"m.$k = d.$k").mkString(" AND ")
    s.sql(s"""MERGE INTO $mv m USING ${view}_d d ON $on
      WHEN MATCHED THEN UPDATE SET
        m.cnt = m.cnt + d.d_cnt,
        m.total = CAST(m.total + d.d_sum AS DECIMAL(18,2)),
        m.__as_of = ${latest}L
      WHEN NOT MATCHED THEN INSERT ($keyList, cnt, total, __as_of)
        VALUES (${keys.map("d." + _).mkString(", ")}, d.d_cnt,
          CAST(d.d_sum AS DECIMAL(18,2)), ${latest}L)""")
    s.catalog.dropTempView(view)
    s.catalog.dropTempView(view + "_d")
    // freshness HINT for the auto-rewrite rule ([[graft.plans.MvRewrite]]),
    // landed as a separate metadata-only commit AFTER the fold: the hint
    // can only under-state freshness (crash between the two commits →
    // stale hint → the rule declines a rewrite it could have done), so
    // exactly-once maintenance still never depends on a side channel
    diskTable(s, mv).commitProperty("graft.mv.applied", latest.toString)
    latest
  }

  /** The serving projection: tombstones (zero-count groups, kept so the
    * watermark can never regress) stay out of user-visible results. */
  def serve(s: SparkSession, mv: String, keys: Seq[String]): DataFrame =
    s.sql(s"""SELECT ${keys.mkString(", ")}, cnt,
        CAST(total AS DOUBLE) AS total
      FROM $mv WHERE cnt > 0
      ORDER BY ${keys.mkString(", ")}""")
}
