package graft

import org.apache.spark.sql.functions._
import graft.geo.Datum

class DatumSpec extends SparkSuite {
  import spark.implicits._

  private def one(lat: Double, lon: Double, h: Double,
                  f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
                      org.apache.spark.sql.Column) =>
                    (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
                     org.apache.spark.sql.Column)): (Double, Double, Double) = {
    val (a, b, c) = f(col("lat"), col("lon"), col("h"))
    val r = Seq((lat, lon, h)).toDF("lat", "lon", "h")
      .select(a.as("a"), b.as("b"), c.as("c")).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("geodetic → geocentric → geodetic round-trips to sub-µm") {
    for ((lat, lon, h) <- Seq((51.5, -0.1, 45.0), (-33.86, 151.21, 10.0),
        (0.0, 0.0, 0.0), (89.0, 179.0, 8000.0), (-89.0, -179.0, -100.0))) {
      val (la, lo, hh) = one(lat, lon, h, (p, l, e) => {
        val (x, y, z) = Datum.toGeocentric(p, l, e, Datum.Wgs84)
        Datum.toGeodetic(x, y, z, Datum.Wgs84)
      })
      assert(math.abs(la - lat) < 1e-11, s"lat $lat -> $la")
      assert(math.abs(lo - lon) < 1e-11, s"lon $lon -> $lo")
      assert(math.abs(hh - h) < 1e-6, s"h $h -> $hh")
    }
  }

  test("known geocentric values: equator and pole") {
    // equator, prime meridian, h=0: X = a exactly
    val (x, y, z) = one(0.0, 0.0, 0.0,
      (p, l, e) => Datum.toGeocentric(p, l, e, Datum.Wgs84))
    assert(math.abs(x - 6378137.0) < 1e-6 && math.abs(y) < 1e-9 &&
      math.abs(z) < 1e-9)
    // north pole: Z = b = a(1-f)
    val (_, _, zp) = one(90.0, 0.0, 0.0,
      (p, l, e) => Datum.toGeocentric(p, l, e, Datum.Wgs84))
    assert(math.abs(zp - 6378137.0 * (1.0 - 1.0 / 298.257223563)) < 1e-6)
  }

  test("Helmert forward then inverse params round-trips within ~1 cm") {
    val p = Datum.Osgb36ToWgs84
    for ((lat, lon, h) <- Seq((51.5, -0.1, 45.0), (57.0, -5.0, 1200.0))) {
      val (la, lo, hh) = one(lat, lon, h, (pp, ll, ee) => {
        val (f1, f2, f3) = Datum.transform(pp, ll, ee,
          Datum.Airy1830, p, Datum.Wgs84)
        Datum.transform(f1, f2, f3, Datum.Wgs84, p.inverse, Datum.Airy1830)
      })
      // negated-parameter inverse is the standard approximation: its
      // second-order error is dominated by the scale×translation and
      // rotation×translation cross terms (s·|T| ≈ 2.05e-5 × 560 m ≈ 12 mm
      // in h; rz·tx ≈ 4.1e-6 rad × 446 m ≈ 2 mm ≈ 3e-8 deg in lat/lon) —
      // well under the query's 1e-6 deg rt_ok tripwire
      assert(math.abs(la - lat) < 1e-7 && math.abs(lo - lon) < 1e-7,
        s"($lat,$lon) -> ($la,$lo)")
      assert(math.abs(hh - h) < 0.05, s"h $h -> $hh")
    }
  }

  test("OSGB36→WGS84 matches the pinned longdouble artifact on spot keys") {
    // independent second method: tools/helmert_expected.parquet was
    // produced by numpy longdouble (gen_helmert_expected.py); the engine
    // chain must land on the same canonically-rounded values
    val exp = spark.read.parquet("tools/helmert_expected.parquet")
      .filter(col("c_custkey") < 50)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val pts = spark.range(50).select(col("id").as("k"),
      (graft.rng.Rand.u01(col("id"), 61) * 10.0 + 50.0).as("lat"),
      (graft.rng.Rand.u01(col("id"), 62) * 10.0 - 8.0).as("lon"),
      (graft.rng.Rand.u01(col("id"), 63) * 1000.0).as("h"))
    val (la, lo, hh) = Datum.transform(col("lat"), col("lon"), col("h"),
      Datum.Airy1830, Datum.Osgb36ToWgs84, Datum.Wgs84)
    val got = pts.select(col("k"),
        graft.functions.Canon.round(la, 8).as("la"),
        graft.functions.Canon.round(lo, 8).as("lo"),
        graft.functions.Canon.round(hh, 3).as("hh"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == exp)
  }

  test("Helmert14: at refEpoch the zero-param set is the identity") {
    val p = Datum.Itrf2014ToGda2020
    val df = Seq((-27.5, 153.0, 40.0, 2020.0)).toDF("lat", "lon", "h", "epoch")
    val (la, lo, hh) = Datum.transform14(col("lat"), col("lon"), col("h"),
      col("epoch"), Datum.Grs80, p, Datum.Grs80)
    val r = df.select(la.as("a"), lo.as("b"), hh.as("c")).head()
    assert(math.abs(r.getDouble(0) - -27.5) < 1e-11)
    assert(math.abs(r.getDouble(1) - 153.0) < 1e-11)
    assert(math.abs(r.getDouble(2) - 40.0) < 1e-6)
  }

  test("Helmert14: epoch propagation magnitude and inverse round-trip") {
    val p = Datum.Itrf2014ToGda2020
    // 2015 -> 2020 is 5 years of ~1.5 mas/yr plate rotation: expect a
    // horizontal shift of a few decimetres, doubling over double the span
    def shiftAt(epoch: Double): Double = {
      val df = Seq((-27.5, 153.0, 40.0, epoch)).toDF("lat", "lon", "h", "epoch")
      val (la, lo, _) = Datum.transform14(col("lat"), col("lon"), col("h"),
        col("epoch"), Datum.Grs80, p, Datum.Grs80)
      val r = df.select(la.as("a"), lo.as("b")).head()
      val dLat = (r.getDouble(0) + 27.5) * 111320.0
      val dLon = (r.getDouble(1) - 153.0) * 111320.0 * math.cos(math.toRadians(27.5))
      math.hypot(dLat, dLon)
    }
    val s5 = shiftAt(2015.0)
    val s10 = shiftAt(2010.0)
    assert(s5 > 0.2 && s5 < 0.6, s"5-year shift $s5 m")
    assert(math.abs(s10 / s5 - 2.0) < 1e-3, s"linear in Δepoch: $s10 vs $s5")
    // inverse at the same epoch round-trips
    for (epoch <- Seq(2010.0, 2017.25, 2024.9375)) {
      val df = Seq((-44.0, 112.0, 0.0, epoch), (-10.0, 154.0, 950.0, epoch))
        .toDF("lat", "lon", "h", "epoch")
      val (la, lo, hh) = Datum.transform14(col("lat"), col("lon"), col("h"),
        col("epoch"), Datum.Grs80, p, Datum.Grs80)
      val fwd = df.select(col("lat"), col("lon"), col("epoch"),
        la.as("glat"), lo.as("glon"), hh.as("gh"))
      val (bla, blo, _) = Datum.transform14(col("glat"), col("glon"), col("gh"),
        col("epoch"), Datum.Grs80, p.inverse, Datum.Grs80)
      fwd.select((abs(bla - col("lat")) + abs(blo - col("lon"))).as("err"))
        .collect().foreach(r => assert(r.getDouble(0) < 1e-9, s"rt at $epoch"))
    }
  }

  test("ITRF2014→GDA2020 matches the pinned longdouble artifact on spot keys") {
    val exp = spark.read.parquet("tools/helmert14_expected.parquet")
      .filter(col("c_custkey") < 50)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val pts = spark.range(50).select(col("id").as("k"),
      (-(graft.rng.Rand.u01(col("id"), 71) * 34.0 + 10.0)).as("lat"),
      (graft.rng.Rand.u01(col("id"), 72) * 42.0 + 112.0).as("lon"),
      (graft.rng.Rand.u01(col("id"), 73) * 1000.0).as("h"),
      (floor(graft.rng.Rand.u01(col("id"), 74) * 160.0) / 16.0 + 2015.0).as("epoch"))
    val (la, lo, hh) = Datum.transform14(col("lat"), col("lon"), col("h"),
      col("epoch"), Datum.Grs80, Datum.Itrf2014ToGda2020, Datum.Grs80)
    val got = pts.select(col("k"), col("epoch"),
        graft.functions.Canon.round(la, 8).as("la"),
        graft.functions.Canon.round(lo, 8).as("lo"),
        graft.functions.Canon.round(hh, 3).as("hh"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == exp)
  }
}
