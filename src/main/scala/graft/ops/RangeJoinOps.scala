package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded time-range join — "right events within (leftTs, leftTs + window]
  * of a left event, same key".
  *
  * Spark plans the naive `l.ts < r.ts AND r.ts <= l.ts + w` condition with
  * the equi-key as a hash join and the range as residual — correct, but if
  * the key is skewed (one hot user) every candidate pair for that key lands
  * on one task. This implementation adds TIME BINNING on top of the
  * equi-key, the standard scalable range-join trick (Databricks' range-join
  * hint, Flink's interval join): bucket both sides into fixed bins of the
  * window width; a left row can only match right rows in its own or the
  * next bin, so the join key becomes (key, bin) — bounded fan-out of 2 rows
  * per left row, candidate pairs per task bounded by rows-per-bin rather
  * than rows-per-key, and the residual range predicate filters exactly.
  *
  * At 100 TB: one shuffle on (key, bin); skew from a hot key is spread
  * across its time bins; no cross product beyond adjacent bins.
  */
object RangeJoinOps {

  /** @param left     left rows (all columns preserved)
    * @param right    right rows (payload columns appended)
    * @param key      equi-key column name on both sides
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name (must differ from leftTs)
    * @param windowSec  match window: rightTs in (leftTs, leftTs + windowSec]
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val lBin = (unix_timestamp(col(leftTs)) / windowSec).cast("long")
    val rBin = (unix_timestamp(col(rightTs)) / windowSec).cast("long")

    // a right match at leftTs + w can be at most one bin ahead
    val lExploded = left
      .withColumn("__bin", explode(array(lBin, lBin + 1)))
      .withColumn("__k", col(key))
    val rBinned = right
      .withColumn("__bin", rBin)
      .withColumnRenamed(key, "__rk")

    lExploded
      .join(rBinned,
        col("__k") === col("__rk") && lExploded("__bin") === rBinned("__bin"))
      .filter(
        col(rightTs) > col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("__bin", "__k", "__rk")
  }
}
