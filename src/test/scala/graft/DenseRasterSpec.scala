package graft

import org.apache.spark.sql.functions._
import graft.ingest.DenseRaster
import graft.raster.{GridMeta, PixelGrid}

class DenseRasterSpec extends SparkSuite {
  import spark.implicits._

  test("dense → pixels drops nodata and round-trips exactly") {
    val meta = GridMeta(width = 4, height = 3)
    val dense = Seq(
      (0, Seq(1.0, -9999.0, 3.0, 4.0)),
      (1, Seq(-9999.0, -9999.0, -9999.0, -9999.0)),
      (2, Seq(9.0, 8.0, 7.0, -9999.0))).toDF("row", "values")
    val px = DenseRaster.toPixels(dense, meta)
    assert(px.count() == 6) // 12 cells − 6 nodata
    assert(px.filter($"row" === 1).count() == 0)
    val back = DenseRaster.toDense(px, meta).orderBy("row")
      .as[(Int, Seq[Double])].collect()
    assert(back.length == 3)
    assert(back(0)._2 == Seq(1.0, -9999.0, 3.0, 4.0))
    assert(back(1)._2 == Seq(-9999.0, -9999.0, -9999.0, -9999.0))
    assert(back(2)._2 == Seq(9.0, 8.0, 7.0, -9999.0))
  }

  test("derived grid survives densify/unpivot round trip") {
    val meta = GridMeta(width = PixelGrid.W, height = PixelGrid.W)
    val g = PixelGrid.grid(spark, sf001, 0)
    val rt = DenseRaster.toPixels(DenseRaster.toDense(g, meta), meta)
    assert(rt.count() == g.count())
    assert(rt.except(g).count() == 0 && g.except(rt).count() == 0)
  }
}
