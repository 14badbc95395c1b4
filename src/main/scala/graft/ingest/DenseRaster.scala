package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.raster.GridMeta

/** Dense-raster ↔ pixel-table conversion — the ingest utility of
  * SURVEY.md §2.1 ("for real GeoTIFFs, an ingest utility converts tiles →
  * pixel-table Parquet"). A GeoTIFF decoded tile arrives as one array row
  * per raster row (or per tile strip); unpivoting is a posexplode and the
  * nodata sentinel (−9999, differencing_functions.py:700) normalizes to
  * row absence. The inverse densifies a pixel table back to strips with
  * the sentinel filled in — the write-side of the GeoTIFF boundary.
  * Both directions are single narrow passes (explode / groupBy row), so a
  * 100-TB raster converts tile-parallel with one shuffle on the densify
  * side only.
  */
object DenseRaster {

  /** `[row:int, values:array<double>]` → valid-pixel table. */
  def toPixels(dense: DataFrame, meta: GridMeta = GridMeta()): DataFrame =
    dense.select(col("row"), posexplode(col("values")).as(Seq("col", "value")))
      .filter(col("value").isNotNull && col("value") =!= meta.nodata &&
        !isnan(col("value")))
      .select(col("col").cast("int").as("col"), col("row"), col("value"))

  /** Pixel table → dense strips, nodata sentinel in the gaps. */
  def toDense(px: DataFrame, meta: GridMeta = GridMeta()): DataFrame = {
    val spark = px.sparkSession
    val full = spark.range(meta.height.toLong)
      .select(col("id").cast("int").as("row"))
      .crossJoin(spark.range(meta.width.toLong)
        .select(col("id").cast("int").as("col")))
    full.join(px, Seq("col", "row"), "left_outer")
      .withColumn("value", coalesce(col("value"), lit(meta.nodata)))
      .groupBy("row")
      .agg(transform(
        array_sort(collect_list(struct(col("col"), col("value")))),
        s => s.getField("value")).as("values"))
  }
}
