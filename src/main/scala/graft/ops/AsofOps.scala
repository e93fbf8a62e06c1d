package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal point) join — an operator Spark has no built-in for.
  *
  * For each left row, attach the LATEST right row whose timestamp is ≤ the
  * left row's timestamp, within the same key. The naive formulation is an
  * inequality join + per-left-row argmax — a shuffle-heavy O(n·m) plan. This
  * implementation is the scalable union-scan form:
  *
  *   1. union both sides into one keyed, timestamped stream
  *      (right rows carry their payload as a struct; left rows carry null);
  *   2. ONE shuffle: window over (key) ordered by (ts, side) — right rows
  *      sort before left rows at equal timestamps, giving `<=` semantics;
  *   3. `last(payload, ignoreNulls)` over the unbounded-preceding frame
  *      carries the most recent right payload forward;
  *   4. keep only left rows, unpack the carried struct.
  *
  * Cost: one hash shuffle + one sort per key group — the same shape as a
  * window aggregate, independent of match distance; at 100 TB there is no
  * candidate-pair blowup because no join ever materializes pairs.
  *
  * Determinism: if the right side has multiple rows at the same (key, ts),
  * which one wins is tie-broken by the payload struct's ordering; dedupe the
  * right side per (key, ts) first if a specific winner is required.
  */
object AsofOps {

  /** @param left        left (probe) rows; all columns preserved
    * @param right       right (reference) rows
    * @param key         equi-key column name present on both sides
    * @param leftTs      left timestamp column name
    * @param rightTs     right timestamp column name
    * @param rightCols   right payload column names to attach (null when no
    *                    right row is at or before the left row's timestamp)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val payloadStruct = struct(rightCols.map(col).toIndexedSeq: _*)

    val lU = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      leftStruct.as("__l"),
      lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__r"))
    val rU = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(left.select(leftStruct).schema.head.dataType).as("__l"),
      payloadStruct.as("__r"))

    // right-before-left at equal ts ⇒ a right row AT the left timestamp
    // matches (ASOF >=); struct tiebreak keeps equal-ts right rows ordered
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq
    val carriedCols = rightCols.map(c => col(s"__c.$c").as(c))
    lU.unionByName(rU)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols ++ carriedCols: _*)
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * whose timestamp is ≥ the left row's timestamp within the same key —
    * the "next scheduled event" lookup (next maintenance window, next
    * price tick). Same union-scan shape as [[asofJoin]], mirrored: left
    * rows sort BEFORE right rows at equal timestamps (≥ semantics) and
    * `first(payload, ignoreNulls)` over the current-row→unbounded-following
    * frame carries the nearest following right payload backward. One
    * shuffle, no pair materialization — identical 100 TB cost model.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val payloadStruct = struct(rightCols.map(col).toIndexedSeq: _*)

    val lU = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(0).as("__side"),
      leftStruct.as("__l"),
      lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__r"))
    val rU = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(left.select(leftStruct).schema.head.dataType).as("__l"),
      payloadStruct.as("__r"))

    // left-before-right at equal ts ⇒ a right row AT the left timestamp
    // matches (ASOF <=); struct tiebreak keeps equal-ts right rows ordered
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq
    val carriedCols = rightCols.map(c => col(s"__c.$c").as(c))
    lU.unionByName(rU)
      .withColumn("__c", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols ++ carriedCols: _*)
  }
}
