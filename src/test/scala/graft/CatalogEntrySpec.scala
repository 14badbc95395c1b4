package graft

import org.apache.spark.sql.functions._
import graft.ingest.Catalog

class CatalogEntrySpec extends SparkSuite {
  import spark.implicits._

  val fixture: String =
    """{"Datasets":[
      {"Dataset":{"name":"Survey A","identifier":{"propertyID":"opentopoID.USGSdem","value":"USGS_A"},
        "spatialCoverage":{"additionalProperty":[{"name":"EPSG (Horizontal)","value":"32611"},{"name":"EPSG (Vertical)","value":"5703"}]},
        "temporalCoverage":"2018-01-13 / 2018-06-11"}},
      {"Dataset":{"name":"Survey B","identifier":{"propertyID":"opentopoID.NOAAlidar","value":"NOAA_B"},
        "spatialCoverage":{"additionalProperty":[{"name":"EPSG (Horizontal)","value":"26910"}]},
        "temporalCoverage":"2020-05-02"}},
      {"Dataset":{"name":"Survey C","identifier":{"propertyID":"OTLAS.112018","value":"OT_C"},
        "spatialCoverage":{"additionalProperty":[]},
        "temporalCoverage":"2016-09-01 / 2016-09-30"}}]}"""

  test("catalog flatten: epsg extraction, source classifier, date shapes") {
    val df = Catalog.flatten(Seq(fixture).toDF("json"))
    val rows = df.collect()
    assert(rows.length == 3)
    val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("Survey A").getAs[String]("horizontal_epsg") == "32611")
    assert(byName("Survey A").getAs[String]("source") == "usgs")
    assert(byName("Survey A").getAs[java.sql.Date]("start_date").toString == "2018-01-13")
    assert(byName("Survey A").getAs[java.sql.Date]("end_date").toString == "2018-06-11")
    // single-date coverage: end == start
    assert(byName("Survey B").getAs[String]("source") == "noaa")
    assert(byName("Survey B").getAs[java.sql.Date]("end_date").toString == "2020-05-02")
    assert(byName("Survey C").getAs[String]("source") == "ot")
    assert(byName("Survey C").getAs[String]("horizontal_epsg") == null)
    // sorted by start date
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("Survey C", "Survey A", "Survey B"))
  }

  test("flagship entry returns a nonempty uncertainty report") {
    val r = SparkEntry.entry(spark).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n") > 0)
    assert(!r.head.isNullAt(1) && !r.head.isNullAt(2))
  }

  test("every declared query analyzes and every oracle entry has a query") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet), s"orphan oracle: ${os.keySet -- qs.keySet}")
    qs.foreach { case (name, fn) =>
      val schema = fn(spark, sf001).schema // forces full analysis, no execution
      assert(schema.nonEmpty, s"$name has empty schema")
    }
  }
}
