package graft.tables

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-memory mutable tables with per-column defaults and INSERT / DELETE /
  * UPDATE, mirroring the reference's `MemoryTable`
  * (`qurious/src/datasource/memory.rs:21-140`) and its column-default surface
  * (`TableProvider::get_column_default`, `qurious/src/provider/table.rs:43-45`).
  *
  * The reference holds `Vec<RecordBatch>` behind a RwLock and mutates in
  * place; Spark DataFrames are immutable, so each mutation derives a new
  * plan over the previous state and re-registers the temp view (view-swap,
  * SURVEY.md §7.3). Data stays distributed — mutations are plan surgery, not
  * driver-side row edits; plans are periodically localCheckpoint'ed so a
  * long mutation chain can't grow unboundedly.
  *
  * Unlike the reference, UPDATE actually executes (qurious plans it then
  * fails at runtime, `qurious/src/execution/session.rs:130-134`).
  */
final class MutableTableManager(spark: SparkSession) {

  final case class TableState(
      schema: StructType,
      defaults: Map[String, String], // column name -> default expression SQL
      df: DataFrame,
      mutations: Int,
      checks: Seq[String] = Nil, // CHECK constraint expressions
      uniques: Seq[Seq[String]] = Nil, // UNIQUE / PRIMARY KEY column sets
      foreignKeys: Seq[MutableTableManager.FkDef] = Nil)

  private val tables = TrieMap.empty[String, TableState]

  private def norm(name: String): String = name.toLowerCase

  def exists(name: String): Boolean = tables.contains(norm(name))

  def table(name: String): DataFrame =
    tables.getOrElse(norm(name), sys.error(s"table not found: $name")).df

  def schema(name: String): StructType =
    tables.getOrElse(norm(name), sys.error(s"table not found: $name")).schema

  /** Full state (schema, defaults, constraints) — EXPORT DATABASE uses
    * this to round-trip everything the catalog knows about a table. */
  def stateOf(name: String): TableState =
    tables.getOrElse(norm(name), sys.error(s"table not found: $name"))

  /** CREATE TABLE. With `data` = CTAS; otherwise an empty table with the
    * declared schema. */
  def create(
      name: String,
      schema: StructType,
      defaults: Map[String, String] = Map.empty,
      data: Option[DataFrame] = None,
      ifNotExists: Boolean = false,
      checks: Seq[String] = Nil,
      uniques: Seq[Seq[String]] = Nil,
      foreignKeys: Seq[MutableTableManager.FkDef] = Nil): Unit = {
    val key = norm(name)
    if (tables.contains(key)) {
      if (ifNotExists) return
      sys.error(s"table already exists: $name")
    }
    val normFks = foreignKeys.map(fk => fk.copy(cols = fk.cols.map(norm),
      parentTable = norm(fk.parentTable), parentCols = fk.parentCols.map(norm)))
    normFks.foreach { fk =>
      require(fk.cols.length == fk.parentCols.length,
        s"FOREIGN KEY column count mismatch: (${fk.cols.mkString(", ")}) vs " +
          s"(${fk.parentCols.mkString(", ")})")
      require(fk.cols.forall(c => schema.fieldNames.map(norm).contains(c)),
        s"FOREIGN KEY references unknown column in $name")
      if (fk.parentTable != key) { // self-references resolve to this table
        val p = tables.getOrElse(fk.parentTable,
          sys.error(s"FOREIGN KEY references missing table: ${fk.parentTable}"))
        require(fk.parentCols.forall(c =>
            p.schema.fieldNames.map(norm).contains(c)),
          s"FOREIGN KEY references unknown column in ${fk.parentTable}")
      }
    }
    val df = data match {
      case Some(d) => align(d, schema, schema.fieldNames.toSeq, defaults)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val st = TableState(schema, defaults.map { case (k, v) => norm(k) -> v },
      df, 0, checks, uniques.map(_.map(norm)), normFks)
    data.foreach { _ => // CTAS rows must conform before the table exists
      enforceRowConstraints(st, df)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      enforceUnique(st.copy(df = empty), df)
      enforceForeignKeys(key, st, df)
    }
    put(key, st, "CREATE")
  }

  // ------------------------------------------------ constraint enforcement

  /** NOT NULL + CHECK over `rows` — ONE combined aggregate action, and no
    * action at all for constraint-free tables. Violations error before the
    * table state advances, so a failed statement leaves no version. */
  private def enforceRowConstraints(st: TableState, rows: DataFrame): Unit = {
    val nn = st.schema.fields.filterNot(_.nullable).map(_.name).toSeq
    val aggs = nn.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))) ++
      st.checks.map(ck =>
        sum(when(!coalesce(expr(ck), lit(false)), 1L).otherwise(0L)))
    if (aggs.nonEmpty) {
      val r = rows.agg(aggs.head, aggs.tail: _*).head()
      nn.zipWithIndex.foreach { case (c, i) =>
        require(r.getLong(i) == 0, s"NOT NULL constraint violated: column $c") }
      st.checks.zipWithIndex.foreach { case (ck, i) =>
        require(r.getLong(nn.length + i) == 0, s"CHECK constraint violated: ($ck)") }
    }
  }

  /** UNIQUE / PRIMARY KEY for an incoming batch: duplicates within the
    * batch (one groupBy over batch rows only) and collisions against the
    * stored table (a key-equality LEFT SEMI probe — at scale this is the
    * same shuffle a MERGE pays, and it is exactly the price engines that
    * enforce PK uniqueness pay per ingest). NULL keys never collide (SQL
    * UNIQUE semantics; PRIMARY KEY columns are already NOT NULL). */
  private def enforceUnique(st: TableState, batch: DataFrame): Unit =
    st.uniques.foreach { cols =>
      val inBatch = batch.groupBy(cols.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1 && cols.map(col(_).isNotNull).reduce(_ && _))
        .limit(1).count()
      require(inBatch == 0,
        s"UNIQUE constraint violated within inserted rows: (${cols.mkString(", ")})")
      val b = batch.alias("__b")
      val t = st.df.alias("__t")
      val clash = b.join(t,
          cols.map(c => col(s"__b.$c") === col(s"__t.$c")).reduce(_ && _),
          "left_semi")
        .limit(1).count()
      require(clash == 0,
        s"UNIQUE constraint violated against existing rows: (${cols.mkString(", ")})")
    }

  /** FOREIGN KEY for an incoming batch: every non-null FK tuple must exist
    * in the parent — ONE LEFT ANTI probe per declared FK (the same shuffle
    * shape as [[enforceUnique]]'s collision check; at scale this is the
    * standard referential-ingest price). Self-referencing FKs resolve
    * against the candidate post-write state (existing ∪ batch). */
  private def enforceForeignKeys(
      selfKey: String, st: TableState, batch: DataFrame): Unit =
    st.foreignKeys.foreach { fk =>
      val parentKeys = (
        if (fk.parentTable == selfKey)
          st.df.select(fk.parentCols.map(col).toIndexedSeq: _*)
            .unionByName(batch.select(fk.parentCols.map(col).toIndexedSeq: _*))
        else tables.getOrElse(fk.parentTable,
            sys.error(s"FOREIGN KEY references missing table: ${fk.parentTable}"))
          .df.select(fk.parentCols.map(col).toIndexedSeq: _*)
      ).toDF(fk.cols: _*)
      val children = batch
        .filter(fk.cols.map(col(_).isNotNull).reduce(_ && _))
        .select(fk.cols.map(col).toIndexedSeq: _*)
      val orphans = children.alias("__c")
        .join(parentKeys.alias("__p"),
          fk.cols.map(c => col(s"__c.$c") === col(s"__p.$c")).reduce(_ && _),
          "left_anti")
        .limit(1).count()
      require(orphans == 0,
        s"FOREIGN KEY constraint${if (fk.name.nonEmpty) s" ${fk.name}" else ""} " +
          s"violated: (${fk.cols.mkString(", ")}) value not present in " +
          s"${fk.parentTable}(${fk.parentCols.mkString(", ")})")
    }

  /** Parent-side RESTRICT: with `parentKey`'s rows about to become `kept`,
    * every other table's FK rows pointing at it must still resolve — a
    * DELETE/TRUNCATE/UPDATE that would orphan a child row fails before any
    * state advances. One LEFT ANTI probe per referencing child. */
  private def enforceFkRestrict(parentKey: String, kept: DataFrame): Unit =
    for {
      (childKey, childSt) <- tables.readOnlySnapshot()
      fk <- childSt.foreignKeys
      if fk.parentTable == parentKey && childKey != parentKey
    } {
      val parentKeys = kept.select(fk.parentCols.map(col).toIndexedSeq: _*)
        .toDF(fk.cols: _*)
      val refs = childSt.df
        .filter(fk.cols.map(col(_).isNotNull).reduce(_ && _))
        .select(fk.cols.map(col).toIndexedSeq: _*)
      val orphans = refs.alias("__c")
        .join(parentKeys.alias("__p"),
          fk.cols.map(c => col(s"__c.$c") === col(s"__p.$c")).reduce(_ && _),
          "left_anti")
        .limit(1).count()
      require(orphans == 0,
        s"FOREIGN KEY constraint${if (fk.name.nonEmpty) s" ${fk.name}" else ""} " +
          s"on $childKey RESTRICTs this write to $parentKey: child rows " +
          s"still reference removed keys (${fk.parentCols.mkString(", ")})")
    }

  def drop(name: String, ifExists: Boolean = false): Unit = {
    val key = norm(name)
    if (tables.remove(key).isEmpty && !ifExists) sys.error(s"table not found: $name")
    histories.remove(key)
    spark.catalog.dropTempView(key)
  }

  /** INSERT; `cols` is the optional explicit column list — missing columns
    * take their DEFAULT (or NULL), per the reference's insert planning
    * (`qurious/src/planner/sql.rs:790-873`). Returns inserted row count. */
  def insert(name: String, input: DataFrame, cols: Option[Seq[String]] = None): Long = {
    val key = norm(name)
    val st = tables.getOrElse(key, sys.error(s"table not found: $name"))
    val targetCols = cols.map(_.map(norm)).getOrElse(st.schema.fieldNames.toSeq)
    // Reject unknown / duplicate target columns up front — the reference's
    // insert planning errors on them (`qurious/src/planner/sql.rs:790-873`);
    // silently dropping a misspelled column would lose data.
    val known = st.schema.fieldNames.map(norm).toSet
    val unknown = targetCols.filterNot(known)
    require(unknown.isEmpty, s"INSERT column(s) not in table $name: ${unknown.mkString(", ")}")
    require(targetCols.distinct.size == targetCols.size,
      s"INSERT duplicate target column(s): ${targetCols.diff(targetCols.distinct).mkString(", ")}")
    require(
      input.schema.size == targetCols.size,
      s"INSERT arity mismatch: ${input.schema.size} values for ${targetCols.size} columns")
    val aligned = align(input, st.schema, targetCols, st.defaults)
    enforceRowConstraints(st, aligned)
    enforceUnique(st, aligned)
    enforceForeignKeys(key, st, aligned)
    val n = aligned.count()
    put(key, st.copy(df = checkpointed(st.df.unionByName(aligned), st.mutations), mutations = st.mutations + 1), "INSERT")
    n
  }

  /** DELETE WHERE; no predicate → truncate (reference memory.rs:113-140).
    * Kept rows are those where the predicate is NOT TRUE (false or null) —
    * same Kleene semantics as filtering on the negated predicate with
    * null-rejection. Returns deleted count. */
  def delete(name: String, where: Option[String] = None): Long = {
    val key = norm(name)
    val st = tables.getOrElse(key, sys.error(s"table not found: $name"))
    val before = st.df.count()
    val kept = where match {
      case Some(pred) => st.df.filter(!coalesce(expr(pred), lit(false)))
      case None => st.df.limit(0)
    }
    enforceFkRestrict(key, kept)
    val after = kept.count()
    put(key, st.copy(df = checkpointed(kept, st.mutations), mutations = st.mutations + 1), "DELETE")
    before - after
  }

  /** UPDATE SET col = expr [, ...] WHERE pred — projection replacing the
    * assigned columns where the predicate holds (the plan shape the
    * reference produces in `update_to_plan`, `qurious/src/planner/sql.rs:377-432`,
    * but actually executed). Returns affected row count. */
  def update(name: String, set: Seq[(String, String)], where: Option[String] = None): Long = {
    val key = norm(name)
    val st = tables.getOrElse(key, sys.error(s"table not found: $name"))
    val pred = where.map(expr).getOrElse(lit(true))
    // Stamp the predicate against PRE-update values: SET may change a column
    // the WHERE references (UPDATE t SET bal = -5 WHERE bal = 100), so
    // re-filtering post-update rows with the same predicate would miss
    // exactly the rows that changed and skip constraint enforcement on them.
    // marker name must not collide with a user column (withColumn REPLACES
    // same-named columns, which would pass the predicate boolean through as
    // that column's new value) — probe for a free name
    val marker = Iterator.from(0)
      .map(i => if (i == 0) "__upd" else s"__upd$i")
      .find(n => !st.schema.fieldNames.exists(_.equalsIgnoreCase(n))).get
    val marked = st.df.withColumn(marker, coalesce(pred, lit(false)))
    val affected = marked.filter(col(marker)).count()
    val assignments = set.map { case (c, e) => norm(c) -> e }.toMap
    val projected = st.schema.fields.map { f =>
      assignments.get(norm(f.name)) match {
        case Some(e) =>
          when(col(marker), expr(e).cast(f.dataType))
            .otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }
    // re-verify NOT NULL/CHECK on the CHANGED rows only (engines never
    // re-scan unchanged rows on update), selected by the pre-update marker;
    // UNIQUE re-verification on update is out of scope, as in most
    // lakehouse engines
    if (st.checks.nonEmpty || st.schema.fields.exists(!_.nullable))
      enforceRowConstraints(st,
        marked.filter(col(marker)).select(projected.toIndexedSeq: _*))
    val newDf = marked.select(projected.toIndexedSeq: _*)
    val assigned = assignments.keySet
    // child-side: updated FK columns must still resolve in the parent
    if (st.foreignKeys.exists(_.cols.exists(assigned)))
      enforceForeignKeys(key, st.copy(df = newDf),
        marked.filter(col(marker)).select(projected.toIndexedSeq: _*))
    // parent-side: updating a REFERENCED key column must not orphan a child
    if (tables.readOnlySnapshot().exists { case (ck, cst) =>
        ck != key && cst.foreignKeys.exists(fk =>
          fk.parentTable == key && fk.parentCols.exists(assigned)) })
      enforceFkRestrict(key, newDf)
    put(key, st.copy(df = checkpointed(newDf, st.mutations),
      mutations = st.mutations + 1), "UPDATE")
    affected
  }

  /** MERGE INTO — the distributed upsert, executed as ONE full-outer join +
    * projection (no per-row lookups, no driver round trips; at scale this
    * is a single shuffle on the join keys):
    *
    *   - matched target rows: UPDATE SET projection or DELETE (filtered out)
    *   - unmatched target rows: kept as-is
    *   - unmatched source rows: INSERT projection (or dropped if no clause)
    *
    * `cond`, update and insert expressions may reference `targetAlias.col` /
    * `sourceAlias.col`. Multiple source matches for one target row follow
    * join semantics (the row multiplies) — callers wanting strict SQL
    * MERGE cardinality should dedupe the source on the join key first.
    * Returns affected rows (updated + deleted + inserted). */
  def merge(
      name: String,
      targetAlias: String,
      source: DataFrame,
      sourceAlias: String,
      cond: String,
      updateSet: Option[Seq[(String, String)]],
      matchedDelete: Boolean,
      insert: Option[(Option[Seq[String]], Seq[String])]): Long = {
    val key = norm(name)
    val st = tables.getOrElse(key, sys.error(s"table not found: $name"))
    require(!(updateSet.isDefined && matchedDelete),
      "MERGE supports one WHEN MATCHED action (UPDATE or DELETE), not both")

    val t = st.df.withColumn("__t_mark", lit(1)).alias(targetAlias)
    val s = source.withColumn("__s_mark", lit(1)).alias(sourceAlias)
    val j = t.join(s, expr(cond), "full_outer")
    val matched = col("__t_mark").isNotNull && col("__s_mark").isNotNull
    val targetOnly = col("__t_mark").isNotNull && col("__s_mark").isNull
    val sourceOnly = col("__t_mark").isNull && col("__s_mark").isNotNull

    // INSERT column list → per-target-column expression (DEFAULT/NULL fill)
    val insertExprs: Map[String, String] = insert match {
      case None => Map.empty
      case Some((colsOpt, values)) =>
        val cols = colsOpt.map(_.map(norm)).getOrElse(st.schema.fieldNames.map(norm).toSeq)
        require(cols.size == values.size,
          s"MERGE INSERT arity mismatch: ${values.size} values for ${cols.size} columns")
        cols.zip(values).toMap
    }
    val updates = updateSet.getOrElse(Nil).map { case (c, e) => norm(c) -> e }.toMap

    val keep =
      (if (matchedDelete) !matched else lit(true)) &&
        (if (insert.isEmpty) !sourceOnly else lit(true))

    val outCols = st.schema.fields.map { f =>
      val tRef = col(s"$targetAlias.${f.name}")
      val matchedVal = updates.get(norm(f.name))
        .map(e => expr(e).cast(f.dataType)).getOrElse(tRef)
      val insertVal = insertExprs.get(norm(f.name))
        .map(e => expr(e).cast(f.dataType))
        .getOrElse(st.defaults.get(norm(f.name))
          .map(d => expr(d).cast(f.dataType))
          .getOrElse(lit(null).cast(f.dataType)))
      when(matched, matchedVal)
        .when(targetOnly, tRef)
        .otherwise(insertVal)
        .as(f.name)
    }

    // ONE execution of the join: materialize projection + marks together,
    // then derive both the affected counts and the stored table from the
    // checkpoint. Separate count() actions would re-run the join (up to 3×
    // the cost, and inconsistent counts for a nondeterministic source).
    val full = j
      .select((outCols.toIndexedSeq :+ matched.as("__matched")
        :+ sourceOnly.as("__source_only") :+ keep.as("__keep")): _*)
      .localCheckpoint()
    val counts = full.agg(
      coalesce(sum(when(col("__matched"), 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("__source_only"), 1L).otherwise(0L)), lit(0L))).head()
    val affected =
      (if (updateSet.isDefined || matchedDelete) counts.getLong(0) else 0L) +
        (if (insert.isDefined) counts.getLong(1) else 0L)
    val merged = full.filter(col("__keep"))
      .select(st.schema.fieldNames.map(col).toIndexedSeq: _*)
    put(key, st.copy(df = merged, mutations = st.mutations + 1), "MERGE")
    affected
  }

  // -------------------------------------------------- ALTER TABLE surface

  /** ADD COLUMN: existing rows backfill with the DEFAULT expression (or
    * NULL), and the default persists for later INSERT column-subset fills.
    * Schema evolution as plan surgery — a `withColumn` over the stored
    * plan, nothing materializes. */
  def addColumn(name: String, field: StructField, default: Option[String]): Unit = {
    val key = norm(name)
    val st = tables.getOrElse(key, sys.error(s"table not found: $name"))
    require(!st.schema.fieldNames.exists(f => norm(f) == norm(field.name)),
      s"column already exists: ${field.name}")
    val value = default.map(e => expr(e).cast(field.dataType))
      .getOrElse(lit(null).cast(field.dataType))
    put(key, st.copy(
      schema = StructType(st.schema.fields :+ field),
      defaults = st.defaults ++ default.map(norm(field.name) -> _),
      df = checkpointed(st.df.withColumn(field.name, value), st.mutations),
      mutations = st.mutations + 1), "ALTER ADD COLUMN")
  }

  /** DROP COLUMN (the last column cannot be dropped). */
  def dropColumn(name: String, colName: String): Unit = {
    val key = norm(name)
    val st = tables.getOrElse(key, sys.error(s"table not found: $name"))
    val target = st.schema.fields.find(f => norm(f.name) == norm(colName))
      .getOrElse(sys.error(s"column not found: $colName")).name
    require(st.schema.size > 1, s"cannot drop the only column of $name")
    put(key, st.copy(
      schema = StructType(st.schema.fields.filterNot(_.name == target)),
      defaults = st.defaults - norm(colName),
      df = checkpointed(st.df.drop(target), st.mutations),
      mutations = st.mutations + 1), "ALTER DROP COLUMN")
  }

  /** RENAME COLUMN — defaults follow the rename. */
  def renameColumn(name: String, from: String, to: String): Unit = {
    val key = norm(name)
    val st = tables.getOrElse(key, sys.error(s"table not found: $name"))
    val src = st.schema.fields.find(f => norm(f.name) == norm(from))
      .getOrElse(sys.error(s"column not found: $from")).name
    require(!st.schema.fieldNames.exists(f => norm(f) == norm(to)),
      s"column already exists: $to")
    put(key, st.copy(
      schema = StructType(st.schema.fields.map(f =>
        if (f.name == src) f.copy(name = to) else f)),
      defaults = st.defaults.get(norm(from))
        .map(d => st.defaults - norm(from) + (norm(to) -> d))
        .getOrElse(st.defaults),
      df = checkpointed(st.df.withColumnRenamed(src, to), st.mutations),
      mutations = st.mutations + 1), "ALTER RENAME COLUMN")
  }

  /** Conform `input` (positional, possibly a column subset) to the target
    * schema: name positionally, fill unlisted columns with their DEFAULT
    * expression (or NULL), cast everything to the declared types. */
  private def align(
      input: DataFrame,
      schema: StructType,
      targetCols: Seq[String],
      defaults: Map[String, String]): DataFrame = {
    val renamed = input.toDF(targetCols: _*)
    val projection = schema.fields.map { f =>
      if (targetCols.contains(norm(f.name))) col(norm(f.name)).cast(f.dataType).as(f.name)
      else defaults.get(norm(f.name)) match {
        case Some(d) => expr(d).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    renamed.select(projection.toIndexedSeq: _*)
  }

  /** Bound mutation-chain plan depth: every few mutations, snapshot the
    * lineage into cached partitions (stays distributed; no driver collect). */
  private def checkpointed(df: DataFrame, mutations: Int): DataFrame =
    if ((mutations + 1) % 8 == 0) df.localCheckpoint(eager = false) else df

  /** Per-table snapshot history: entry i is the table AFTER its i-th
    * operation (version 0 = CREATE). Spark plans are immutable, so every
    * superseded `df` IS a stable snapshot — holding the reference is the
    * in-memory analog of a Delta/Iceberg transaction log, and `VERSION AS
    * OF` resolves against it with zero copying. History length equals the
    * mutation count (each entry is a plan, periodically checkpointed, not
    * materialized rows); a deployment retiring old versions would truncate
    * this vector exactly like VACUUM retires old table files. */
  private val histories = TrieMap.empty[String, Vector[(String, TableState)]]

  private def put(key: String, st: TableState, op: String): Unit = {
    tables.update(key, st)
    histories.update(key, histories.getOrElse(key, Vector.empty) :+ (op -> st))
    st.df.createOrReplaceTempView(key)
  }

  /** Snapshot of `name` as of `version` (0-based operation count). */
  def versionOf(name: String, version: Int): DataFrame = {
    val h = histories.getOrElse(norm(name), sys.error(s"table not found: $name"))
    require(version >= 0 && version < h.size,
      s"version $version out of range [0, ${h.size - 1}] for $name")
    h(version)._2.df
  }

  /** Number of recorded versions (history length). */
  def versionCount(name: String): Int =
    histories.getOrElse(norm(name), sys.error(s"table not found: $name")).size

  /** Restore `name` to the state it had at `version` — schema, defaults
    * and data all roll back together (the snapshot holds the full
    * TableState, not just the plan). Recorded as a ROLLBACK history entry
    * so the log stays append-only, Delta-style: undo is a new version. */
  def restore(name: String, version: Int): Unit = {
    val key = norm(name)
    val h = histories.getOrElse(key, sys.error(s"table not found: $name"))
    require(version >= 0 && version < h.size,
      s"version $version out of range [0, ${h.size - 1}] for $name")
    put(key, h(version)._2, "ROLLBACK")
  }

  /** (version, operation) log for DESCRIBE HISTORY. */
  def history(name: String): Seq[(Int, String)] = {
    val h = histories.getOrElse(norm(name), sys.error(s"table not found: $name"))
    h.zipWithIndex.map { case ((op, _), i) => (i, op) }
  }

  def listTables(): Seq[String] = tables.keys.toSeq.sorted
}

object MutableTableManager {
  /** One declared FOREIGN KEY: `[CONSTRAINT name] FOREIGN KEY (cols)
    * REFERENCES parentTable (parentCols)`. */
  final case class FkDef(
      name: String, cols: Seq[String],
      parentTable: String, parentCols: Seq[String])
}
