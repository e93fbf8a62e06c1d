package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a corpus — the lakehouse
  * `EXPECT <name> AS <predicate> ON VIOLATION <action>` shape (public
  * Delta Live Tables semantics; the reference has no quality layer, this
  * is extension surface for the training-data pipeline).
  *
  * Everything is ONE codegen'd projection per output, zero shuffle:
  * every row is tagged with the array of expectation names it violates
  * (a NULL predicate result counts as a violation — ternary logic never
  * lets a row "pass by NULL"), then
  *   - `clean` keeps rows violating no drop/fail expectation,
  *   - `quarantine` routes drop-violators out WITH their violated names
  *     (the production dead-letter lane — nothing is silently lost),
  *   - `metrics` is one combinable aggregate: per-expectation violation
  *     counts plus the kept-row count,
  *   - `enforce` aborts the batch if any `fail` expectation is violated
  *     (one limit(1) probe — the scheduler-gate shape).
  * `warn` expectations count in metrics but never remove rows. At 100 TB
  * each output is a filter over the scan — no shuffle, no collect. */
object ExpectationsOps {

  /** One rule: `action` ∈ drop (quarantine the row), warn (count only),
    * fail (abort the batch if any row violates). */
  final case class Expectation(name: String, predicateSql: String,
      action: String) {
    require(Set("drop", "warn", "fail")(action),
      s"expectation action must be drop|warn|fail, got $action")
  }

  /** NULL-safe violation test: true when the predicate is false OR null. */
  private def violates(e: Expectation): Column =
    !coalesce(expr(e.predicateSql), lit(false))

  /** The violated-names tag for a row (empty array = fully clean). */
  def violatedNames(exps: Seq[Expectation]): Column =
    array_compact(array(exps.map(e =>
      when(violates(e), lit(e.name)).otherwise(lit(null))): _*))

  private def removing(exps: Seq[Expectation]): Seq[Expectation] =
    exps.filter(e => e.action == "drop" || e.action == "fail")

  /** Rows violating NO drop/fail expectation (warn violations stay). */
  def clean(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    removing(exps).map(violates).reduceOption(_ || _) match {
      case Some(bad) => df.filter(!bad)
      case None => df
    }

  /** Drop/fail violators, tagged with every expectation name they
    * violate (warn names included — the quarantine row tells the whole
    * story), original columns preserved after the tag. */
  def quarantine(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    val bad = removing(exps).map(violates).reduceOption(_ || _)
      .getOrElse(lit(false))
    df.filter(bad)
      .select(array_join(array_sort(violatedNames(exps)), ",")
        .as("violated") +: df.columns.map(col).toIndexedSeq: _*)
  }

  /** One combinable aggregate: a row per expectation with its violation
    * count, plus a `__kept` row with the post-drop row count. */
  def metrics(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    val aggs = exps.map(e =>
      sum(when(violates(e), 1L).otherwise(0L)).as(e.name)) :+
      sum(when(removing(exps).map(violates).reduceOption(_ || _)
        .getOrElse(lit(false)), 0L).otherwise(1L)).as("__kept")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = exps.map(e => (e.name, e.action)) :+ ("__kept" -> "info")
    one.select(explode(array(pairs.map { case (n, a) =>
        struct(lit(n).as("expectation"), lit(a).as("action"),
          col(s"`$n`").cast("long").as("rows"))
      }: _*)).as("m"))
      .select("m.*")
  }

  /** Abort if any `fail` expectation is violated; returns the input for
    * chaining. One limit(1) probe per fail rule — a scalar, never rows. */
  def enforce(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    exps.filter(_.action == "fail").foreach { e =>
      if (df.filter(violates(e)).limit(1).count() > 0)
        throw new IllegalStateException(
          s"expectation '${e.name}' (ON VIOLATION FAIL) is violated: " +
            s"${e.predicateSql}")
    }
    df
  }
}
