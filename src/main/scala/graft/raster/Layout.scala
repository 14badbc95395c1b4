package graft.raster

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical layout for pixel tables at scale (SURVEY.md §4 "Physical
  * layout decisions"): write rasters as bucketed+sorted tables on the
  * join key `(col, row)` so raster-vs-raster operations (differencing,
  * masking, overlap) plan WITHOUT a shuffle — both sides arrive
  * co-partitioned and sorted, and SortMergeJoin consumes them directly.
  *
  * At 100 TB this is the difference between re-shuffling the full raster
  * per pairwise operation and reading it join-ready: the expensive
  * exchange happens once at ingest. Bucket count scales with data volume
  * (buckets ≈ bytes / 128 MB); the same layout serves every downstream
  * grid op because they all key on (col, row).
  */
object Layout {

  /** Save a pixel table bucketed+sorted by (col, row). */
  def saveBucketed(px: DataFrame, table: String, buckets: Int = 8): Unit =
    px.write.mode("overwrite")
      .bucketBy(buckets, "col", "row")
      .sortBy("col", "row")
      .format("parquet")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Save partition-pruned + run-sorted + size-capped parquet: the
    * directory layout for an append-only 100-TB fact table. `partCol`
    * values become directories (partition pruning at the scan),
    * `sortCols` order rows inside every file (rowgroup min/max stats
    * make point/range reads skip pages), and `maxRecordsPerFile` caps
    * file size so compaction and task planning stay uniform. The
    * repartition on `partCol` gives one task per partition value —
    * without it every task writes every partition directory (tiny-file
    * explosion, the classic at-scale mistake this helper exists to
    * avoid). */
  def saveSorted(px: DataFrame, path: String, partCol: String,
      sortCols: Seq[String], maxRecordsPerFile: Long): Unit =
    px.repartition(org.apache.spark.sql.functions.col(partCol))
      .sortWithinPartitions(partCol +: sortCols map
        org.apache.spark.sql.functions.col: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol)
      .parquet(path)

  /** True if the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
