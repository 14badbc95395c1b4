package graft

import org.apache.spark.sql.functions._
import graft.geom.Geom
import graft.raster.Terrain

class GeomTerrainSpec extends SparkSuite {
  import spark.implicits._

  test("point-in-polygon: square, diamond, concave") {
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val diamond = Seq((5.0, 0.0), (10.0, 5.0), (5.0, 10.0), (0.0, 5.0))
    // concave "L" shape
    val ell = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0), (4.0, 10.0), (0.0, 10.0))
    val pts = Seq(
      (5.0, 5.0, true, true, false),   // center: in square+diamond, notch of L
      (1.0, 1.0, true, false, true),
      (9.5, 9.5, true, false, false),
      (11.0, 5.0, false, false, false),
      (1.0, 9.0, true, false, true),
      (9.0, 1.0, true, false, true))
    val df = pts.toDF("x", "y", "inSq", "inDi", "inL")
    def check(poly: Seq[(Double, Double)], colName: String) = {
      val got = df.select(col(colName),
        Geom.pointInPolygon(col("x"), col("y"), Geom.polyLit(poly)).as("got"))
        .collect()
      got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
        s"$colName mismatch for row $r"))
    }
    check(square, "inSq"); check(diamond, "inDi"); check(ell, "inL")
  }

  test("wkt round trip") {
    val pts = Seq((1.5, 2.5), (3.0, 4.0), (5.25, 0.0))
    assert(Geom.wktToPoints(Geom.pointsToWkt(pts)) == pts)
  }

  test("roughness and slope on a hand grid") {
    // 3×3 grid: plane z = 2*col → gx = 2, gy = 0 (res=1)
    val px = (for (r <- 0 until 3; c <- 0 until 3)
      yield (c, r, 2.0 * c)).toDF("col", "row", "value")
    val rough = Terrain.roughness(px).collect()
    assert(rough.length == 1) // only the center has a full neighborhood
    assert(rough.head.getInt(0) == 1 && rough.head.getInt(1) == 1)
    assert(rough.head.getDouble(2) == 4.0) // max 4 − min 0
    val slope = Terrain.slope(px, 1.0).collect().head.getDouble(2)
    val expected = math.toDegrees(math.atan(2.0))
    assert(math.abs(slope - expected) < 1e-5, s"slope $slope vs $expected")
  }

  test("gapfill idw fills holes with neighbor-weighted values") {
    // 3×3 grid with center missing; all neighbors = 5 → fill = 5
    val px = (for (r <- 0 until 3; c <- 0 until 3 if !(r == 1 && c == 1))
      yield (c, r, 5.0)).toDF("col", "row", "value")
    val filled = Terrain.gapfillIdw(px, 3, 2).filter($"col" === 1 && $"row" === 1)
      .collect()
    assert(filled.length == 1 && math.abs(filled.head.getDouble(2) - 5.0) < 1e-9)
  }

  test("cubic gapfill reproduces linear fields exactly and matches linear on 2-point rows") {
    // Hermite with central-difference slopes is exact on degree ≤ 1:
    // filling holes of z = 3 + 0.5·col must recover the plane exactly
    val w = 12
    val px = (for (r <- 0 until w; c <- 0 until w if (c * 7 + r * 3) % 4 != 0)
      yield (c, r, 3.0 + 0.5 * c)).toDF("col", "row", "value")
    val validCols = (for (r <- 0 until w; c <- 0 until w
      if (c * 7 + r * 3) % 4 != 0) yield (r, c))
      .groupBy(_._1).map { case (r, cs) => r -> cs.map(_._2) }
    val filled = Terrain.gapfillCubic(px, w).collect()
    assert(filled.nonEmpty)
    var interior = 0
    filled.foreach { rw =>
      val (c, r) = (rw.getInt(0), rw.getInt(1))
      // edge cells with one bracket take that bracket's value (same
      // contract as the linear variant) — exactness holds on interior cells
      if (validCols(r).min < c && c < validCols(r).max) {
        interior += 1
        val expected = math.floor((3.0 + 0.5 * c) * 1e6 + 0.5) / 1e6
        assert(rw.getDouble(2) == expected, s"cell $rw: expected $expected")
      }
    }
    assert(interior > 20, s"fixture too sparse: only $interior interior holes")
    // a row with exactly two valid points has no second neighbors on
    // either side → both slopes fall back to the secant → equals linear
    val two = Seq((0, 0, 10.0), (7, 0, 24.0)).toDF("col", "row", "value")
    val cub = Terrain.gapfillCubic(two, 8).collect()
      .map(r => (r.getInt(0), r.getDouble(2))).toMap
    val lin = Terrain.gapfillLinear(two, 8).collect()
      .map(r => (r.getInt(0), r.getDouble(2))).toMap
    assert(cub.keySet == lin.keySet && cub.keySet == (1 to 6).toSet)
    cub.foreach { case (c, v) => assert(v == lin(c), s"col $c: $v vs ${lin(c)}") }
  }
}
