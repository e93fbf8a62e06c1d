package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-semantics compatibility helpers (SURVEY.md §1.3). */
object Compat {

  /** Stable sort: the reference appends an implicit ascending row-index as
    * the final sort key so equal-key rows keep input order
    * (`qurious/src/physical/plan/sort.rs:60-76`). Spark sort is not stable
    * across partitions; this reproduces the guarantee explicitly. The index
    * is assigned before the shuffle, so the cost is one narrow projection. */
  def stableSort(df: DataFrame, keys: Column*): DataFrame =
    df.withColumn("__row_idx", monotonically_increasing_id())
      .orderBy(keys :+ col("__row_idx").asc: _*)
      .drop("__row_idx")

  /** Reference null ordering: nulls first regardless of direction
    * (`qurious/src/planner/mod.rs:339-342`). */
  def refAsc(c: Column): Column = c.asc_nulls_first
  def refDesc(c: Column): Column = c.desc_nulls_first

  /** Decimal-division-as-double (`qurious/src/utils/type_coercion.rs:103-110`):
    * the reference coerces both operands of `/` to Float64 whenever either
    * side is decimal. */
  def refDiv(a: Column, b: Column): Column = a.cast("double") / b.cast("double")

  /** COUNT(*) display-name parity (`count_wildcard_rule.rs:8-32`). */
  def countStar(): Column = count(lit(1)).as("COUNT(*)")
}
