package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md "salting for skew"). AQE's
  * skew-join handling covers sort-merge joins; these explicit forms cover
  * the cases it doesn't — skewed aggregation keys and broadcast-side
  * replication — and make the technique available as library operators.
  */
object SkewOps {

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt) so a hot key spreads over `salts` reducers, then combine.
    * Results equal the plain groupBy; the hot-key reducer bottleneck goes
    * from O(hot) rows to O(hot/salts). */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial"), count(lit(1)).as("partial_n"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("total"), sum(col("partial_n")).as("n"))

  /** Skewed equi-join: replicate the (broadcastable) right side once per
    * salt and scatter the left side's hot keys across salts, so one hot
    * key's rows land on `salts` different reducers instead of one. Equal to
    * the plain inner join. */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
