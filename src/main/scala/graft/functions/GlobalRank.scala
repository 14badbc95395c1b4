package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global 1-based row index ordered by `orderCols` WITHOUT a whole-table
  * window partition (which funnels the entire relation through one
  * reducer): range-repartition on the keys, rank within each partition,
  * then add per-partition offsets computed from a numPartitions-row side
  * table — the two-level rank. Every sort is bounded at n/P rows; the only
  * unpartitioned window runs over the P-row counts aggregate. Ties across
  * a partition boundary receive an arbitrary order, same as any
  * row_number — pass a total order (include a unique key) when the index
  * must be reproducible.
  */
object GlobalRank {

  def withGlobalIndex(df: DataFrame, out: String, orderCols: Column*): DataFrame = {
    // two consumers (local ranks + per-partition counts): share one
    // materialization of the range shuffle instead of running it twice
    // (registered with CacheRegistry like every shared persist)
    val parts = CacheRegistry.share(df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val local = parts.withColumn("__rn0",
      row_number().over(Window.partitionBy("__pid").orderBy(orderCols: _*)))
    val counts = parts.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offs = counts // bounded: ≤ numPartitions rows
      .withColumn("__off", coalesce(sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offs), "__pid")
      .withColumn(out, (col("__off") + col("__rn0")).cast("long"))
      .drop("__pid", "__rn0", "__off")
  }
}
