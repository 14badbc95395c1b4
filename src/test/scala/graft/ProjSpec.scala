package graft

import org.apache.spark.sql.functions._
import graft.geo.Proj

class ProjSpec extends SparkSuite {
  import spark.implicits._

  test("easting at the central meridian is exactly E0; equator northing exactly 0") {
    for (lat <- Seq(-60.0, -10.0, 0.0, 33.3, 78.9)) {
      val (e, n) = Proj.forward(lat, -75.0, -75.0)
      assert(e == Proj.E0, s"lat $lat easting $e")
      if (lat == 0.0) assert(n == 0.0)
      if (lat > 0.0) assert(n > 0.0)
      if (lat < 0.0) assert(n < 0.0)
    }
  }

  test("central-meridian northing equals k0 × the numerically integrated meridian arc") {
    // SECOND METHOD: Simpson integration of the meridian curvature radius
    // M(φ) = a(1−e²)/(1−e²sin²φ)^{3/2} — pins the rectifying radius and
    // the whole ξ series to < 1 mm over a quarter meridian
    val e2 = Proj.FLAT * (2.0 - Proj.FLAT)
    def m(phi: Double): Double =
      Proj.A_AXIS * (1.0 - e2) /
        math.pow(1.0 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    for (latDeg <- Seq(15.0, 30.0, 45.0, 60.0, 75.0, 84.0)) {
      val phi = math.toRadians(latDeg)
      val steps = 20000
      val h = phi / steps
      var s = m(0.0) + m(phi)
      for (i <- 1 until steps)
        s += (if (i % 2 == 1) 4.0 else 2.0) * m(i * h)
      val arc = s * h / 3.0
      val (_, nn) = Proj.forward(latDeg, -75.0, -75.0)
      assert(math.abs(nn - Proj.K0 * arc) < 1e-3,
        s"lat $latDeg: northing $nn vs k0·arc ${Proj.K0 * arc}")
    }
  }

  test("forward∘inverse closes to < 1e-9 degrees across the zone") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val lat = rng.nextDouble() * 168.0 - 84.0
      val lon0 = (rng.nextInt(60) * 6 - 180 + 3).toDouble
      val lon = lon0 + rng.nextDouble() * 6.0 - 3.0
      val (e, n) = Proj.forward(lat, lon, lon0)
      val (lat2, lon2) = Proj.inverse(e, n, lon0)
      assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lon2 - lon) < 1e-9,
        s"($lat, $lon) → ($e, $n) → ($lat2, $lon2)")
    }
  }

  test("projection is symmetric about the central meridian") {
    for (lat <- Seq(-45.0, 10.0, 60.0); d <- Seq(0.5, 1.5, 2.9)) {
      val (eE, nE) = Proj.forward(lat, -75.0 + d, -75.0)
      val (eW, nW) = Proj.forward(lat, -75.0 - d, -75.0)
      assert(math.abs((eE - Proj.E0) + (eW - Proj.E0)) < 1e-6,
        s"easting asymmetry at $lat±$d")
      assert(math.abs(nE - nW) < 1e-6, s"northing asymmetry at $lat±$d")
    }
  }

  test("Column path is bit-identical to the scalar path") {
    val pts = Seq((12.345, -74.1), (-33.9, -77.7), (71.2, -72.25), (0.0, -75.0))
    val df = pts.toDF("lat", "lon")
    val (e, n) = Proj.forwardCols(col("lat"), col("lon"), lit(-75.0))
    val (lat2, lon2) = Proj.inverseCols(e, n, lit(-75.0))
    val got = df.select(e.as("e"), n.as("n"), lat2.as("la"), lon2.as("lo")).collect()
    for (((lat, lon), row) <- pts.zip(got)) {
      val (se, sn) = Proj.forward(lat, lon, -75.0)
      val (sla, slo) = Proj.inverse(se, sn, -75.0)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(se), s"easting($lat,$lon)")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(sn), s"northing($lat,$lon)")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(sla), s"lat($lat,$lon)")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(slo), s"lon($lat,$lon)")
    }
  }

  test("known geometry: one degree of longitude at the equator ≈ 111.32 km scaled by k0") {
    val (e1, _) = Proj.forward(0.0, -74.0, -75.0)
    // a·1° = 111319.49 m of arc; TM easting at the equator for small dλ is
    // k0·a·atanh(sin dλ) ≈ k0·111321.4 m — allow the small TM stretch
    val d = e1 - Proj.E0
    assert(d > Proj.K0 * 111000.0 && d < Proj.K0 * 111600.0, s"got $d")
  }
}
