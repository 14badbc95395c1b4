package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalog-JSON flattening — the Spark form of the reference's
  * OpenTopography catalog ingestion (`query_catalog`,
  * differencing_functions.py:406–510): nested
  * `Datasets[].Dataset{name, identifier{propertyID,value},
  * spatialCoverage{additionalProperty[{name,value}]}, temporalCoverage}`
  * documents become a flat dataset table via `from_json` → `explode` →
  * name-filtered property extraction (SURVEY.md §2.9). The HTTP fetch
  * itself is out of scope (zero-egress); this takes the JSON strings.
  */
object Catalog {

  private val propertyType = StructType(Seq(
    StructField("name", StringType), StructField("value", StringType)))
  private val datasetType = StructType(Seq(
    StructField("name", StringType),
    StructField("identifier", StructType(Seq(
      StructField("propertyID", StringType), StructField("value", StringType)))),
    StructField("spatialCoverage", StructType(Seq(
      StructField("additionalProperty", ArrayType(propertyType))))),
    StructField("temporalCoverage", StringType)))
  val catalogSchema: StructType = StructType(Seq(
    StructField("Datasets", ArrayType(StructType(Seq(
      StructField("Dataset", datasetType)))))))

  /** One row per dataset: name, source classifier, horizontal EPSG (the
    * name-filtered additionalProperty), parsed start/end dates. */
  def flatten(jsonDocs: DataFrame, jsonCol: String = "json"): DataFrame = {
    val parsed = jsonDocs
      .withColumn("cat", from_json(col(jsonCol), catalogSchema))
      .select(explode(col("cat.Datasets")).as("d"))
      .select(
        col("d.Dataset.name").as("name"),
        col("d.Dataset.identifier.propertyID").as("property_id"),
        col("d.Dataset.identifier.value").as("identifier"),
        col("d.Dataset.spatialCoverage.additionalProperty").as("props"),
        col("d.Dataset.temporalCoverage").as("coverage"))
    parsed
      .withColumn("horizontal_epsg",
        try_element_at(filter(col("props"), p =>
          p.getField("name") === "EPSG (Horizontal)"), lit(1)).getField("value"))
      .withColumn("source",
        when(lower(col("property_id")).contains("usgs"), "usgs")
          .when(lower(col("property_id")).contains("noaa"), "noaa")
          .otherwise("ot"))
      .withColumn("start_date",
        to_date(trim(try_element_at(split(col("coverage"), "/"), lit(1)))))
      .withColumn("end_date",
        coalesce(to_date(trim(try_element_at(split(col("coverage"), "/"), lit(2)))),
          to_date(trim(try_element_at(split(col("coverage"), "/"), lit(1))))))
      .drop("props")
      .orderBy("start_date", "name")
  }
}
