package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodetic datum transformation math as codegen-friendly Columns — the
  * engine analog of the reference's epoch-aware BOUNDCRS / PROJ datum
  * path (differencing_functions.py:2066–2093), which SURVEY §2.2 left a
  * pass-through concern until round 8. No UDFs, no native PROJ: the
  * classic geodesy chain (all public formulae)
  *
  *   geodetic → geocentric (ellipsoid closed form)
  *   7-parameter Helmert, position-vector convention (EPSG method 1033)
  *   geocentric → geodetic (Bowring 1976 non-iterative inverse)
  *
  * runs inside whole-stage codegen exactly like [[Proj]]. Like the UTM
  * gate, the oracle for the full transform is a PINNED artifact computed
  * by an independent numpy-longdouble evaluation
  * (tools/gen_helmert_expected.py) — a foreign engine cannot hash-match
  * a transcendental chain at the ulp level, and the canonical rounding
  * of both sides agrees unless the engine drifts beyond its ~1e-9
  * accuracy budget (DatumSpec pins round trips and magnitudes).
  */
object Datum {

  /** (semi-major axis a [m], inverse flattening 1/f). */
  type Ellipsoid = (Double, Double)
  val Wgs84: Ellipsoid = (6378137.0, 298.257223563)
  val Grs80: Ellipsoid = (6378137.0, 298.257222101)
  val Airy1830: Ellipsoid = (6377563.396, 299.3249646)
  val Intl1924: Ellipsoid = (6378388.0, 297.0)

  /** 7 Helmert parameters: translations [m], rotations [arc-sec],
    * scale [ppm] — position-vector sign convention. */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
                           rxSec: Double, rySec: Double, rzSec: Double,
                           sPpm: Double) {
    def inverse: Helmert = Helmert(-tx, -ty, -tz, -rxSec, -rySec, -rzSec, -sPpm)
  }

  /** The published OSGB36 → WGS84 set (OSGN guidance note 7; the
    * textbook full-7-parameter example). */
  val Osgb36ToWgs84: Helmert =
    Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

  /** 14-parameter TIME-DEPENDENT Helmert (EPSG method 1053,
    * "time-dependent position vector"): the 7 parameters at `refEpoch`
    * plus their per-year rates. This is the reference's epoch-aware
    * BOUNDCRS path (`+epoch=` decimal years / FRAME_EPOCH,
    * differencing_functions.py:1901–1927, 2066–2093) — what ties two
    * surveys observed in a dynamic frame (ITRF) to a plate-fixed datum
    * at their own observation epochs. Rates: translations [m/yr],
    * rotations [arc-sec/yr], scale [ppm/yr]. */
  final case class Helmert14(tx: Double, ty: Double, tz: Double,
                             rxSec: Double, rySec: Double, rzSec: Double,
                             sPpm: Double,
                             dtx: Double, dty: Double, dtz: Double,
                             drxSec: Double, drySec: Double, drzSec: Double,
                             dsPpm: Double, refEpoch: Double) {
    def inverse: Helmert14 = Helmert14(-tx, -ty, -tz, -rxSec, -rySec, -rzSec,
      -sPpm, -dtx, -dty, -dtz, -drxSec, -drySec, -drzSec, -dsPpm, refEpoch)
    /** Materialize the 7 parameters at a SCALAR epoch (decimal years). */
    def at(epoch: Double): Helmert = {
      val dt = epoch - refEpoch
      Helmert(tx + dtx * dt, ty + dty * dt, tz + dtz * dt,
        rxSec + drxSec * dt, rySec + drySec * dt, rzSec + drzSec * dt,
        sPpm + dsPpm * dt)
    }
  }

  /** The EPSG-published ITRF2014 → GDA2020 time-dependent position-
    * vector set (EPSG:8048; GDA2020 Technical Manual): all seven
    * parameters zero at epoch 2020.0, rotation rates = the Australian
    * plate motion. The canonical published example of method 1053. */
  val Itrf2014ToGda2020: Helmert14 = Helmert14(
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 1.50379e-3, 1.18346e-3, 1.20716e-3, 0.0, 2020.0)

  /** Position-vector Helmert with COLUMN-valued parameters — the
    * per-row-epoch path of [[transform14]]; same expression order as
    * the scalar [[helmert]], all inside whole-stage codegen. */
  def helmertCols(x: Column, y: Column, z: Column,
                  tx: Column, ty: Column, tz: Column,
                  rx: Column, ry: Column, rz: Column,
                  s: Column): (Column, Column, Column) =
    (tx + s * (x - rz * y + ry * z),
      ty + s * (rz * x + y - rx * z),
      tz + s * (-ry * x + rx * y + z))

  /** Full time-dependent datum shift with a PER-ROW epoch column:
    * geodetic on `src` → 14-parameter Helmert materialized at each
    * row's epoch → geodetic on `dst`. The parameter propagation is
    * p0 + rate·Δt, Δt = epoch − refEpoch, with one fixed expression
    * order. NOTE: the pinned-artifact generator multiplies
    * (rate·sec2rad)·Δt where this chain computes (rate·Δt)·sec2rad —
    * the match at the artifact's 8-dp rounding rests on the generator's
    * longdouble headroom absorbing f64 reorder differences (the same
    * tolerance argument as the helmert_expected pattern), not on
    * verbatim op-order mirroring. */
  def transform14(lat: Column, lon: Column, h: Column, epoch: Column,
                  src: Ellipsoid, p: Helmert14, dst: Ellipsoid)
      : (Column, Column, Column) = {
    val sec2rad = math.Pi / (180.0 * 3600.0)
    val dt = epoch - lit(p.refEpoch)
    val tx = lit(p.tx) + lit(p.dtx) * dt
    val ty = lit(p.ty) + lit(p.dty) * dt
    val tz = lit(p.tz) + lit(p.dtz) * dt
    val rx = (lit(p.rxSec) + lit(p.drxSec) * dt) * lit(sec2rad)
    val ry = (lit(p.rySec) + lit(p.drySec) * dt) * lit(sec2rad)
    val rz = (lit(p.rzSec) + lit(p.drzSec) * dt) * lit(sec2rad)
    val s = lit(1.0) + (lit(p.sPpm) + lit(p.dsPpm) * dt) * lit(1e-6)
    val (x, y, z) = toGeocentric(lat, lon, h, src)
    val (x2, y2, z2) = helmertCols(x, y, z, tx, ty, tz, rx, ry, rz, s)
    toGeodetic(x2, y2, z2, dst)
  }

  /** Geodetic (degrees, metres) → geocentric XYZ on `ell`. */
  def toGeocentric(lat: Column, lon: Column, h: Column,
                   ell: Ellipsoid): (Column, Column, Column) = {
    val (a, invF) = ell
    val f = 1.0 / invF
    val e2 = f * (2.0 - f)
    val phi = radians(lat)
    val lam = radians(lon)
    val sinp = sin(phi)
    val cosp = cos(phi)
    val nu = lit(a) / sqrt(lit(1.0) - lit(e2) * sinp * sinp)
    ((nu + h) * cosp * cos(lam),
      (nu + h) * cosp * sin(lam),
      (nu * lit(1.0 - e2) + h) * sinp)
  }

  /** Position-vector Helmert on geocentric coordinates:
    * X' = T + (1 + s)·(I + R)·X with the small-angle rotation matrix
    * [[1, −rz, ry], [rz, 1, −rx], [−ry, rx, 1]]. */
  def helmert(x: Column, y: Column, z: Column,
              p: Helmert): (Column, Column, Column) = {
    val sec2rad = math.Pi / (180.0 * 3600.0)
    val rx = p.rxSec * sec2rad
    val ry = p.rySec * sec2rad
    val rz = p.rzSec * sec2rad
    val s = 1.0 + p.sPpm * 1e-6
    (lit(p.tx) + lit(s) * (x - lit(rz) * y + lit(ry) * z),
      lit(p.ty) + lit(s) * (lit(rz) * x + y - lit(rx) * z),
      lit(p.tz) + lit(s) * (lit(-ry) * x + lit(rx) * y + z))
  }

  /** Geocentric XYZ → geodetic (degrees, metres) on `ell` via Bowring's
    * non-iterative inverse (1976) — sub-µm for |h| < 10 km. */
  def toGeodetic(x: Column, y: Column, z: Column,
                 ell: Ellipsoid): (Column, Column, Column) = {
    val (a, invF) = ell
    val f = 1.0 / invF
    val e2 = f * (2.0 - f)
    val b = a * (1.0 - f)
    val ep2 = e2 / (1.0 - e2)
    val p = sqrt(x * x + y * y)
    val theta = atan2(z * lit(a), p * lit(b))
    val st = sin(theta)
    val ct = cos(theta)
    val phi = atan2(z + lit(ep2 * b) * st * st * st,
      p - lit(e2 * a) * ct * ct * ct)
    val sinp = sin(phi)
    val nu = lit(a) / sqrt(lit(1.0) - lit(e2) * sinp * sinp)
    (degrees(phi), degrees(atan2(y, x)), p / cos(phi) - nu)
  }

  /** Full datum shift: geodetic on `src` ellipsoid → Helmert `p` →
    * geodetic on `dst` ellipsoid. */
  def transform(lat: Column, lon: Column, h: Column,
                src: Ellipsoid, p: Helmert, dst: Ellipsoid)
      : (Column, Column, Column) = {
    val (x, y, z) = toGeocentric(lat, lon, h, src)
    val (x2, y2, z2) = helmert(x, y, z, p)
    toGeodetic(x2, y2, z2, dst)
  }
}
