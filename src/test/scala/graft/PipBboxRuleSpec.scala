package graft

import org.apache.spark.sql.functions._
import graft.geom.Geom
import graft.plans.PipBboxPrefilter

/** The point-in-polygon bbox-injection optimizer rule: soundness (results
  * unchanged), plan effect (range conjuncts appear and reach the parquet
  * scan's PushedFilters when x/y are scan attributes), and idempotence.
  */
class PipBboxRuleSpec extends SparkSuite {

  private val diamond = Seq((64.0, 8.0), (120.0, 64.0), (64.0, 120.0),
    (8.0, 64.0), (64.0, 8.0))

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ PipBboxPrefilter
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  test("rule is sound: identical rows with and without bbox injection") {
    def q = graft.raster.PixelGrid.withXY(graft.raster.PixelGrid.grid(spark, sf001, 0))
      .filter(Geom.pointInPolygon(col("x"), col("y"), Geom.polyLit(diamond)))
    val base = q.orderBy("col", "row").collect().toSeq
    val ruled = withRule { q.orderBy("col", "row").collect().toSeq }
    assert(ruled == base)
  }

  test("rule injects the four bbox conjuncts exactly once (idempotent)") {
    withRule {
      val q = graft.raster.PixelGrid.withXY(graft.raster.PixelGrid.grid(spark, sf001, 0))
        .filter(Geom.pointInPolygon(col("x"), col("y"), Geom.polyLit(diamond)))
      val opt = q.queryExecution.optimizedPlan.toString
      // bbox of the diamond is [8,120]×[8,120]
      assert(opt.contains(">= 8.0") && opt.contains("<= 120.0"),
        s"bbox conjuncts missing:\n$opt")
      val nGte = ">= 8\\.0".r.findAllIn(opt).length
      assert(nGte == 2, s"expected exactly 2 '>= 8.0' conjuncts (x and y), got $nGte:\n$opt")
    }
  }

  test("bbox reaches PushedFilters when x/y are parquet scan columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pip").toFile
    dir.deleteOnExit()
    graft.raster.PixelGrid.withXY(graft.raster.PixelGrid.grid(spark, sf001, 0))
      .select("x", "y", "value")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    withRule {
      val q = spark.read.parquet(dir.getAbsolutePath)
        .filter(Geom.pointInPolygon(col("x"), col("y"), Geom.polyLit(diamond)))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        plan.contains("GreaterThanOrEqual(x,8.0)"),
        s"bbox should push into the scan:\n$plan")
      // and the full predicate still runs: count matches the unruled query
      val n = q.count()
      val base = spark.read.parquet(dir.getAbsolutePath)
        .filter(Geom.pointInPolygon(col("x"), col("y"), Geom.polyLit(diamond)))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PipBboxPrefilter)
      assert(n == base.count())
    }
  }

  test("rule leaves non-literal polygons and join conditions untouched") {
    // vertices from a relation are not foldable — rule must skip them
    val polys = spark.createDataFrame(Seq((1, diamond))).toDF("pid", "pts")
      .select(col("pid"), transform(col("pts"),
        p => struct(p.getField("_1").as("x"), p.getField("_2").as("y"))).as("verts"))
    withRule {
      val px = graft.raster.PixelGrid.withXY(graft.raster.PixelGrid.grid(spark, sf001, 0))
      val joined = px.join(broadcast(polys),
        Geom.pointInPolygon(col("x"), col("y"), col("verts")), "inner")
      // must still execute correctly (no rule crash on join conditions)
      assert(joined.count() > 0)
    }
  }
}
