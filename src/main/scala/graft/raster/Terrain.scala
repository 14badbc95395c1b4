package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Canon.round

/** Focal (3×3 neighborhood) terrain derivatives — the reference delegates
  * these to `gdal.DEMProcessing` (differencing_functions.py:2337–2411); here
  * they are one distributed stencil: each pixel is exploded to the 9 centers
  * it contributes to, then a single hash-aggregate pivots the 9 neighbors
  * back into columns (ONE shuffle total, no 8-way self-join; at 100 TB the
  * shuffle is on the same (col,row) block keys as the table layout).
  * Only centers with a full 3×3 valid neighborhood emit a row (interior
  * cells), which is the well-defined subset of GDAL's edge handling.
  *
  * Grid orientation: row increases southward (north-up raster), cell size
  * `res` meters. z[r][c]: z11=NW z12=N z13=NE / z21=W z22=center z23=E /
  * z31=SW z32=S z33=SE. Horn's method:
  *   gx = ((z13+2·z23+z33) − (z11+2·z21+z31)) / (8·res)
  *   gy = ((z31+2·z32+z33) − (z11+2·z12+z13)) / (8·res)
  */
object Terrain {

  /** Pivot a pixel table into `[col,row, z11..z33]` for full neighborhoods. */
  def neighborhood(px: DataFrame): DataFrame = {
    val offsets = array((for (dr <- -1 to 1; dc <- -1 to 1)
      yield struct(lit(dc).as("dc"), lit(dr).as("dr"))): _*)
    val shifted = px
      .select(col("col"), col("row"), col("value"), explode(offsets).as("o"))
      .select(
        (col("col") + col("o.dc")).as("col"),
        (col("row") + col("o.dr")).as("row"),
        // offset of the SOURCE pixel relative to the new center
        (-col("o.dc")).as("dc"), (-col("o.dr")).as("dr"),
        col("value"))
    def z(dc: Int, dr: Int): Column =
      max(when(col("dc") === dc && col("dr") === dr, col("value"))).as(s"z${dr + 2}${dc + 2}")
    shifted.groupBy("col", "row")
      .agg(count(lit(1)).as("nn"),
        z(-1, -1), z(0, -1), z(1, -1),
        z(-1, 0), z(0, 0), z(1, 0),
        z(-1, 1), z(0, 1), z(1, 1))
      .filter(col("nn") === 9)
      .drop("nn")
  }

  /** DuckDB CTE: same pivot over a grid CTE named `g`. */
  def neighborhoodSql: String = {
    val zs = (for (dr <- -1 to 1; dc <- -1 to 1) yield
      s"""max(CASE WHEN dc = ${-dc} AND dr = ${-dr} THEN value END) AS z${dr + 2}${dc + 2}""")
      .mkString(", ")
    s"""SELECT g.col + dc AS col, g."row" + dr AS "row", dc, dr, value
        FROM g, (SELECT unnest([-1,0,1]) AS dc), (SELECT unnest([-1,0,1]) AS dr)"""
      // note: in the shifted frame the source offset relative to the center is (-dc,-dr)
      .pipe(sh => s"""SELECT col, "row", $zs FROM ($sh) GROUP BY 1, 2 HAVING count(*) = 9""")
  }

  private implicit class Piper[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }

  private[graft] def gx(res: Double): Column =
    ((col("z13") + col("z23") * 2 + col("z33")) -
     (col("z11") + col("z21") * 2 + col("z31"))) / (8 * res)
  private[graft] def gy(res: Double): Column =
    ((col("z31") + col("z32") * 2 + col("z33")) -
     (col("z11") + col("z12") * 2 + col("z13"))) / (8 * res)

  private[graft] def gxSql(res: Double) = s"(((z13 + 2*z23 + z33) - (z11 + 2*z21 + z31)) / ${8 * res})"
  private[graft] def gySql(res: Double) = s"(((z31 + 2*z32 + z33) - (z11 + 2*z12 + z13)) / ${8 * res})"

  /** Slope in degrees (Horn; differencing_functions.py:2358–2372). */
  def slope(px: DataFrame, res: Double = 1.0): DataFrame =
    neighborhood(px).select(col("col"), col("row"),
      round(atan(sqrt(gx(res) * gx(res) + gy(res) * gy(res))) * (180.0 / math.Pi), 6)
        .as("slope_deg"))

  def slopeSqlExpr(res: Double): String =
    s"round(atan(sqrt(${gxSql(res)}*${gxSql(res)} + ${gySql(res)}*${gySql(res)})) * ${180.0 / math.Pi}, 6) AS slope_deg"

  /** Aspect in degrees from north, 0 for flat (differencing_functions.py:2374–2395). */
  def aspect(px: DataFrame, res: Double = 1.0): DataFrame = {
    val g_x = gx(res); val g_y = gy(res)
    val az = atan2(g_y, negate(g_x)) * (180.0 / math.Pi)
    val deg = when(g_x === 0 && g_y === 0, lit(0.0))
      .otherwise(pmod(lit(90.0) - az, lit(360.0)))
    neighborhood(px).select(col("col"), col("row"), round(deg, 6).as("aspect_deg"))
  }

  def aspectSqlExpr(res: Double): String = {
    val gX = gxSql(res); val gY = gySql(res)
    s"""round(CASE WHEN $gX = 0 AND $gY = 0 THEN 0.0
        ELSE ((90.0 - atan2($gY, -$gX) * ${180.0 / math.Pi}) % 360.0 + 360.0) % 360.0
        END, 6) AS aspect_deg"""
  }

  /** Hillshade 0–255, azimuth 315°, altitude 45°
    * (differencing_functions.py:2337–2356). */
  def hillshade(px: DataFrame, res: Double = 1.0,
                azDeg: Double = 315.0, altDeg: Double = 45.0): DataFrame = {
    val zenith = math.toRadians(90.0 - altDeg)
    val azRad = math.toRadians(360.0 - azDeg + 90.0)
    val g_x = gx(res); val g_y = gy(res)
    val slopeR = atan(sqrt(g_x * g_x + g_y * g_y))
    val aspectR = atan2(negate(g_y), g_x)
    val hs = lit(math.cos(zenith)) * cos(slopeR) +
      lit(math.sin(zenith)) * sin(slopeR) * cos(lit(azRad) - aspectR)
    neighborhood(px).select(col("col"), col("row"),
      round(greatest(hs * 255.0, lit(0.0)), 6).as("hillshade"))
  }

  def hillshadeSqlExpr(res: Double, azDeg: Double = 315.0, altDeg: Double = 45.0): String = {
    val zenith = math.toRadians(90.0 - altDeg)
    val azRad = math.toRadians(360.0 - azDeg + 90.0)
    val gX = gxSql(res); val gY = gySql(res)
    s"""round(greatest((${math.cos(zenith)} * cos(atan(sqrt($gX*$gX + $gY*$gY)))
        + ${math.sin(zenith)} * sin(atan(sqrt($gX*$gX + $gY*$gY)))
          * cos($azRad - atan2(-($gY), $gX))) * 255.0, 0.0), 6) AS hillshade"""
  }

  /** Roughness = max − min of the 3×3 neighborhood
    * (differencing_functions.py:2397–2411). */
  def roughness(px: DataFrame): DataFrame = {
    val zs = for (dr <- 1 to 3; dc <- 1 to 3) yield col(s"z$dr$dc")
    neighborhood(px).select(col("col"), col("row"),
      round(greatest(zs: _*) - least(zs: _*), 6).as("roughness"))
  }

  def roughnessSqlExpr: String = {
    val zs = (for (dr <- 1 to 3; dc <- 1 to 3) yield s"z$dr$dc").mkString(", ")
    s"round(greatest($zs) - least($zs), 6) AS roughness"
  }

  /** Zevenbergen & Thorne 1987 curvatures at cell size `res`: general
    * (−2(D+E), the Laplacian form GDAL/ArcGIS report ×100), profile
    * (along-slope) and plan (across-slope), 0 where the gradient
    * vanishes. Same one-shuffle stencil as [[slope]]; both engines run
    * the identical fixed expression tree over the 3×3 columns. */
  def curvature(px: DataFrame, res: Double = 1.0): DataFrame = {
    val dD = (col("z21") + col("z23")) / 2.0 - col("z22")
    val eE = (col("z12") + col("z32")) / 2.0 - col("z22")
    val fF = (negate(col("z11")) + col("z13") + col("z31") - col("z33")) / 4.0
    val gG = (negate(col("z21")) + col("z23")) / 2.0
    val hH = (col("z12") - col("z32")) / 2.0
    val l2 = lit(res * res)
    val g2h2 = gG * gG + hH * hH
    neighborhood(px).select(col("col"), col("row"),
      round(lit(-2.0) * (dD + eE) / l2, 6).as("curv_general"),
      round(when(g2h2 === 0, lit(0.0)).otherwise(
        lit(-2.0) * (dD * gG * gG + eE * hH * hH + fF * gG * hH) / (g2h2 * l2)), 6)
        .as("curv_profile"),
      round(when(g2h2 === 0, lit(0.0)).otherwise(
        lit(2.0) * (dD * hH * hH + eE * gG * gG - fF * gG * hH) / (g2h2 * l2)), 6)
        .as("curv_plan"))
  }

  def curvatureSqlExpr(res: Double = 1.0): String = {
    val d = "((z21 + z23) / 2.0 - z22)"
    val e = "((z12 + z32) / 2.0 - z22)"
    val f = "((-(z11) + z13 + z31 - z33) / 4.0)"
    val g = "((-(z21) + z23) / 2.0)"
    val h = "((z12 - z32) / 2.0)"
    val l2 = (res * res).toString
    val g2h2 = s"($g * $g + $h * $h)"
    s"""round(-2.0 * ($d + $e) / $l2, 6) AS curv_general,
        round(CASE WHEN $g2h2 = 0 THEN 0.0
              ELSE -2.0 * ($d * $g * $g + $e * $h * $h + $f * $g * $h)
                   / ($g2h2 * $l2) END, 6) AS curv_profile,
        round(CASE WHEN $g2h2 = 0 THEN 0.0
              ELSE 2.0 * ($d * $h * $h + $e * $g * $g - $f * $g * $h)
                   / ($g2h2 * $l2) END, 6) AS curv_plan"""
  }

  /** D8 flow direction (O'Callaghan & Mark 1984, ESRI power-of-two
    * encoding E=1 SE=2 S=4 SW=8 W=16 NW=32 N=64 NE=128): the direction of
    * steepest positive drop (z22 − neighbor, diagonals ÷√2), 0 for pits/
    * flats, ties broken in E,SE,S,SW,W,NW,N,NE order. The building block
    * of every flow-accumulation / watershed pipeline; per pixel the
    * decision is one fixed comparison tree over the 3×3 columns, so both
    * engines agree bit-for-bit (√2 is the correctly-rounded IEEE value in
    * both). Same one-shuffle stencil as [[slope]]. */
  def flowD8(px: DataFrame, res: Double = 1.0): DataFrame = {
    val s2 = math.sqrt(2.0) * res
    // (code, drop) in tie-priority order
    val dirs: Seq[(Int, Column)] = Seq(
      1 -> ((col("z22") - col("z23")) / res), // E
      2 -> ((col("z22") - col("z33")) / s2), // SE
      4 -> ((col("z22") - col("z32")) / res), // S
      8 -> ((col("z22") - col("z31")) / s2), // SW
      16 -> ((col("z22") - col("z21")) / res), // W
      32 -> ((col("z22") - col("z11")) / s2), // NW
      64 -> ((col("z22") - col("z12")) / res), // N
      128 -> ((col("z22") - col("z13")) / s2)) // NE
    val maxDrop = greatest(dirs.map(_._2): _*)
    val dir = dirs.foldRight(lit(0)) { case ((code, drop), acc) =>
      when(drop === maxDrop, lit(code)).otherwise(acc)
    }
    neighborhood(px).select(col("col"), col("row"),
      when(maxDrop > 0, dir).otherwise(lit(0)).as("flow_dir"),
      round(when(maxDrop > 0, maxDrop).otherwise(lit(0.0)), 6).as("drop"))
  }

  def flowD8SqlExpr(res: Double = 1.0): String = {
    val s2 = s"(sqrt(2.0) * $res)"
    val dirs = Seq(
      1 -> s"((z22 - z23) / $res)", 2 -> s"((z22 - z33) / $s2)",
      4 -> s"((z22 - z32) / $res)", 8 -> s"((z22 - z31) / $s2)",
      16 -> s"((z22 - z21) / $res)", 32 -> s"((z22 - z11) / $s2)",
      64 -> s"((z22 - z12) / $res)", 128 -> s"((z22 - z13) / $s2)")
    val maxDrop = s"greatest(${dirs.map(_._2).mkString(", ")})"
    // foldRight: the FIRST match in tie-priority order wins
    val pick = dirs.foldRight("0") { case ((code, drop), acc) =>
      s"CASE WHEN $drop = $maxDrop THEN $code ELSE $acc END"
    }
    s"""CAST(CASE WHEN $maxDrop > 0 THEN $pick ELSE 0 END AS INT) AS flow_dir,
        round(CASE WHEN $maxDrop > 0 THEN $maxDrop ELSE 0.0 END, 6) AS "drop""""
  }

  /** Gap-fill by inverse-distance weighting over valid neighbors within
    * Chebyshev radius `maxDist` cells (`fill_no_data`,
    * differencing_functions.py:587–661): every missing cell of the full
    * `w×w` grid gets Σ v/d² / Σ 1/d² of nearby valid pixels. Implemented as
    * bounded offset-explode + equi-join (no theta join): valid pixels are
    * exploded to the (2R+1)² cells they can serve — at scale this is the
    * same one-shuffle stencil as [[neighborhood]], with R a small constant.
    */
  /** IDW weights are accumulated in INTEGER-EXACT arithmetic: value scaled
    * by 1e6 (grid values are 6-decimal canonical) and weight 1/d² scaled by
    * `lcmScale` = lcm of all possible d² — every partial sum is then an
    * integer below 2^53, so the sum is order-independent and bit-identical
    * across engines (a plain Σ v/d² accumulates rationals in engine row
    * order and flips the canonical rounding at decimal midpoints). */
  def gapfillIdw(px: DataFrame, w: Int, maxDist: Int): DataFrame = {
    val spark = px.sparkSession
    val L = lcmScale(maxDist)
    val full = spark.range(w.toLong * w)
      .select((col("id") % w).cast("int").as("col"),
              (col("id") / w).cast("int").as("row"))
    val missing = full.join(px, Seq("col", "row"), "left_anti")
    val offs = array((for (dr <- -maxDist to maxDist; dc <- -maxDist to maxDist
                           if !(dr == 0 && dc == 0))
      yield struct(lit(dc).as("dc"), lit(dr).as("dr"),
        lit((L / (dc * dc + dr * dr)).toDouble).as("wi"))): _*)
    val served = px
      .select(col("col"), col("row"), col("value"), explode(offs).as("o"))
      .select((col("col") + col("o.dc")).as("col"),
              (col("row") + col("o.dr")).as("row"),
              col("o.wi").as("wi"),
              floor(col("value") * 1e6 + 0.5).cast("double").as("v6"))
    missing.join(served, Seq("col", "row"), "inner")
      .groupBy("col", "row")
      .agg(round(sum(col("v6") * col("wi")) / (sum(col("wi")) * 1e6), 6)
        .as("filled"))
  }

  /** Gap-fill by NEAREST valid neighbor within Chebyshev radius `maxDist`
    * (`fill_no_data` method="nearest", differencing_functions.py:587–661):
    * per missing cell, the valid pixel with smallest d², ties broken by
    * (col,row) of the source pixel — same bounded offset-explode shape as
    * the IDW variant, with a rank-1 selection instead of a weighted sum. */
  def gapfillNearest(px: DataFrame, w: Int, maxDist: Int): DataFrame = {
    val spark = px.sparkSession
    val full = spark.range(w.toLong * w)
      .select((col("id") % w).cast("int").as("col"),
              (col("id") / w).cast("int").as("row"))
    val missing = full.join(px, Seq("col", "row"), "left_anti")
    val offs = array((for (dr <- -maxDist to maxDist; dc <- -maxDist to maxDist
                           if !(dr == 0 && dc == 0))
      yield struct(lit(dc).as("dc"), lit(dr).as("dr"))): _*)
    val served = px
      .select(col("col"), col("row"), col("value"), explode(offs).as("o"))
      .select((col("col") + col("o.dc")).as("col"),
              (col("row") + col("o.dr")).as("row"),
              (col("o.dc") * col("o.dc") + col("o.dr") * col("o.dr")).as("d2"),
              col("col").as("scol"), col("row").as("srow"), col("value"))
    missing.join(served, Seq("col", "row"), "inner")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("col", "row")
          .orderBy(col("d2"), col("scol"), col("srow"))))
      .filter(col("rn") === 1)
      .select(col("col"), col("row"), col("value").as("filled"),
        col("d2").cast("int").as("d2"))
  }

  /** Gap-fill by LINEAR interpolation along the row axis
    * (`fill_no_data` method="linear", differencing_functions.py:587–661 —
    * scipy's griddata-linear is a 2-D triangulation; this is the
    * separable 1-D form: each missing cell interpolates between its
    * nearest valid neighbors left and right in the SAME row, which on
    * raster gaps is the dominant term of the triangulated fill). Two
    * IGNORE-NULLS window scans per row — no join at all, and the window
    * partitions by row, so the pass scales with raster height × width
    * like every other stencil here. Edge cells with only one bracket
    * take that bracket's value (scipy's nearest-edge behavior). */
  def gapfillLinear(px: DataFrame, w: Int): DataFrame = {
    val spark = px.sparkSession
    val full = spark.range(w.toLong * w)
      .select((col("id") % w).cast("int").as("col"),
              (col("id") / w).cast("int").as("row"))
    val grid = full.join(px, Seq("col", "row"), "left_outer")
    val win = org.apache.spark.sql.expressions.Window.partitionBy("row").orderBy("col")
    val wl = win.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wr = win.rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val vc = when(col("value").isNotNull, col("col"))
    grid
      .withColumn("lv", last("value", ignoreNulls = true).over(wl))
      .withColumn("lc", last(vc, ignoreNulls = true).over(wl))
      .withColumn("rv", first("value", ignoreNulls = true).over(wr))
      .withColumn("rc", first(vc, ignoreNulls = true).over(wr))
      .filter(col("value").isNull)
      .filter(col("lv").isNotNull || col("rv").isNotNull)
      .select(col("col"), col("row"),
        round(when(col("lv").isNull, col("rv"))
          .when(col("rv").isNull, col("lv"))
          .otherwise(col("lv") + (col("rv") - col("lv")) *
            ((col("col") - col("lc")).cast("double") /
              (col("rc") - col("lc")).cast("double"))), 6).as("filled"))
  }

  def gapfillLinearSql(gridCte: String, w: Int): String =
    s"""WITH g AS ($gridCte),
    full_grid AS (SELECT CAST(i % $w AS INT) AS col, CAST(i // $w AS INT) AS "row"
                  FROM (SELECT unnest(range(${w.toLong * w})) AS i)),
    grid AS (SELECT f.col, f."row", g.value
             FROM full_grid f LEFT JOIN g ON g.col = f.col AND g."row" = f."row"),
    br AS (SELECT col, "row", value,
                  last_value(value IGNORE NULLS) OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv,
                  last_value(CASE WHEN value IS NOT NULL THEN col END IGNORE NULLS)
                    OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc,
                  first_value(value IGNORE NULLS) OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rv,
                  first_value(CASE WHEN value IS NOT NULL THEN col END IGNORE NULLS)
                    OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rc
           FROM grid)
    SELECT col, "row",
           round(CASE WHEN lv IS NULL THEN rv
                      WHEN rv IS NULL THEN lv
                      ELSE lv + (rv - lv) * (CAST(col - lc AS DOUBLE) /
                                             CAST(rc - lc AS DOUBLE)) END, 6) AS filled
    FROM br
    WHERE value IS NULL AND (lv IS NOT NULL OR rv IS NOT NULL)"""

  /** Gap-fill by CUBIC interpolation along the row axis (`fill_no_data`
    * method="cubic", differencing_functions.py:587–661 — scipy's global
    * spline cannot be reproduced engine-independently; this is the local
    * cubic-Hermite form with central-difference slopes, the standard
    * non-uniform Catmull-Rom generalization): each missing cell
    * interpolates on its bracketing valid pair (p1@c1, p2@c2) with end
    * slopes from the second-nearest valid neighbors (p0@c0, p3@c3),
    * falling back to the secant slope at series edges and to the
    * one-sided bracket value where only one side exists.
    *
    * Shape: the same per-row IGNORE-NULLS bracket scan as the linear
    * variant, plus two (row,col) equi-joins to pull each bracket's own
    * lag/lead — all windows partition by row, both joins are
    * co-partitioned on the same keys, so the pass scales like every other
    * stencil here. Every arithmetic step is the identical IEEE expression
    * in both engines (no sums, no transcendentals), so parity is exact. */
  def gapfillCubic(px: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = px.sparkSession
    val full = spark.range(w.toLong * w)
      .select((col("id") % w).cast("int").as("col"),
              (col("id") / w).cast("int").as("row"))
    val grid = full.join(px, Seq("col", "row"), "left_outer")
    val win = Window.partitionBy("row").orderBy("col")
    val wl = win.rowsBetween(Window.unboundedPreceding, 0)
    val wr = win.rowsBetween(0, Window.unboundedFollowing)
    val vc = when(col("value").isNotNull, col("col"))
    val bracketed = grid
      .withColumn("lv", last("value", ignoreNulls = true).over(wl))
      .withColumn("lc", last(vc, ignoreNulls = true).over(wl))
      .withColumn("rv", first("value", ignoreNulls = true).over(wr))
      .withColumn("rc", first(vc, ignoreNulls = true).over(wr))
      .filter(col("value").isNull)
      .filter(col("lv").isNotNull || col("rv").isNotNull)
      .select("col", "row", "lv", "lc", "rv", "rc")
    // each valid pixel with its own previous/next valid neighbor
    val nbr = px.select(col("col"), col("row"), col("value"))
      .withColumn("pc", lag("col", 1).over(win))
      .withColumn("pv", lag("value", 1).over(win))
      .withColumn("nc", lead("col", 1).over(win))
      .withColumn("nv", lead("value", 1).over(win))
    val withL = bracketed.join(
      nbr.select(col("row"), col("col").as("lc"),
        col("pc").as("c0"), col("pv").as("p0")),
      Seq("row", "lc"), "left_outer")
    val withLR = withL.join(
      nbr.select(col("row"), col("col").as("rc"),
        col("nc").as("c3"), col("nv").as("p3")),
      Seq("row", "rc"), "left_outer")
    val h = (col("rc") - col("lc")).cast("double")
    val t = (col("col") - col("lc")).cast("double") / h
    val secant = (col("rv") - col("lv")) / h
    val m1 = when(col("p0").isNotNull,
      (col("rv") - col("p0")) / (col("rc") - col("c0")).cast("double"))
      .otherwise(secant)
    val m2 = when(col("p3").isNotNull,
      (col("p3") - col("lv")) / (col("c3") - col("lc")).cast("double"))
      .otherwise(secant)
    val t2 = t * t
    val t3 = t2 * t
    val cubic = (lit(2.0) * t3 - lit(3.0) * t2 + lit(1.0)) * col("lv") +
      (t3 - lit(2.0) * t2 + t) * h * m1 +
      (lit(-2.0) * t3 + lit(3.0) * t2) * col("rv") +
      (t3 - t2) * h * m2
    withLR.select(col("col"), col("row"),
      round(when(col("lv").isNull, col("rv"))
        .when(col("rv").isNull, col("lv"))
        .otherwise(cubic), 6).as("filled"))
  }

  def gapfillCubicSql(gridCte: String, w: Int): String =
    s"""WITH g AS ($gridCte),
    full_grid AS (SELECT CAST(i % $w AS INT) AS col, CAST(i // $w AS INT) AS "row"
                  FROM (SELECT unnest(range(${w.toLong * w})) AS i)),
    grid AS (SELECT f.col, f."row", g.value
             FROM full_grid f LEFT JOIN g ON g.col = f.col AND g."row" = f."row"),
    br AS (SELECT col, "row", value,
                  last_value(value IGNORE NULLS) OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv,
                  last_value(CASE WHEN value IS NOT NULL THEN col END IGNORE NULLS)
                    OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc,
                  first_value(value IGNORE NULLS) OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rv,
                  first_value(CASE WHEN value IS NOT NULL THEN col END IGNORE NULLS)
                    OVER (PARTITION BY "row" ORDER BY col
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rc
           FROM grid),
    miss AS (SELECT col, "row", lv, lc, rv, rc FROM br
             WHERE value IS NULL AND (lv IS NOT NULL OR rv IS NOT NULL)),
    nbr AS (SELECT col, "row", value,
                   lag(col) OVER (PARTITION BY "row" ORDER BY col) AS pc,
                   lag(value) OVER (PARTITION BY "row" ORDER BY col) AS pv,
                   lead(col) OVER (PARTITION BY "row" ORDER BY col) AS nc,
                   lead(value) OVER (PARTITION BY "row" ORDER BY col) AS nv
            FROM g),
    j AS (SELECT m.col, m."row", m.lv, m.lc, m.rv, m.rc,
                 l.pc AS c0, l.pv AS p0, r.nc AS c3, r.nv AS p3
          FROM miss m
          LEFT JOIN nbr l ON l."row" = m."row" AND l.col = m.lc
          LEFT JOIN nbr r ON r."row" = m."row" AND r.col = m.rc),
    f AS (SELECT col, "row", lv, rv,
                 CAST(rc - lc AS DOUBLE) AS h,
                 CAST(col - lc AS DOUBLE) / CAST(rc - lc AS DOUBLE) AS t,
                 CASE WHEN p0 IS NOT NULL
                      THEN (rv - p0) / CAST(rc - c0 AS DOUBLE)
                      ELSE (rv - lv) / CAST(rc - lc AS DOUBLE) END AS m1,
                 CASE WHEN p3 IS NOT NULL
                      THEN (p3 - lv) / CAST(c3 - lc AS DOUBLE)
                      ELSE (rv - lv) / CAST(rc - lc AS DOUBLE) END AS m2
          FROM j)
    SELECT col, "row",
           round(CASE WHEN lv IS NULL THEN rv
                      WHEN rv IS NULL THEN lv
                      ELSE (2.0*t*t*t - 3.0*t*t + 1.0) * lv
                         + (t*t*t - 2.0*t*t + t) * h * m1
                         + (-2.0*t*t*t + 3.0*t*t) * rv
                         + (t*t*t - t*t) * h * m2 END, 6) AS filled
    FROM f"""

  def gapfillNearestSql(gridCte: String, w: Int, maxDist: Int): String =
    s"""WITH g AS ($gridCte),
    full_grid AS (SELECT CAST(i % $w AS INT) AS col, CAST(i // $w AS INT) AS "row"
                  FROM (SELECT unnest(range(${w.toLong * w})) AS i)),
    missing AS (SELECT f.col, f."row" FROM full_grid f
                ANTI JOIN g ON g.col = f.col AND g."row" = f."row"),
    served AS (SELECT g.col + dc AS col, g."row" + dr AS "row",
                      dc*dc + dr*dr AS d2,
                      g.col AS scol, g."row" AS srow, value
               FROM g,
                    (SELECT unnest(range(-$maxDist, ${maxDist + 1})) AS dc),
                    (SELECT unnest(range(-$maxDist, ${maxDist + 1})) AS dr)
               WHERE NOT (dc = 0 AND dr = 0))
    SELECT m.col, m."row", value AS filled, CAST(d2 AS INT) AS d2
    FROM missing m JOIN served s ON s.col = m.col AND s."row" = m."row"
    QUALIFY row_number() OVER (PARTITION BY m.col, m."row"
                               ORDER BY d2, scol, srow) = 1"""

  /** lcm of all reachable d² = dc²+dr² within Chebyshev radius `maxDist`. */
  def lcmScale(maxDist: Int): Long = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val d2s = (for (dr <- -maxDist to maxDist; dc <- -maxDist to maxDist
                    if !(dr == 0 && dc == 0)) yield (dc * dc + dr * dr).toLong).distinct
    d2s.foldLeft(1L)((l, d) => l / gcd(l, d) * d)
  }

  /** GDAL-FillNodata-style post-fill smoothing (the `smooth_iter` knob of
    * `fill_no_data`, differencing_functions.py:588–630 →
    * gdal.FillNodata(..., smoothing_iterations)): after the IDW
    * interpolation, run `iters` passes of a 3×3 average filter that
    * updates ONLY the filled cells — original valid pixels are never
    * touched — edge-truncated to the neighbors that exist (missing holes
    * beyond the fill radius stay missing and are excluded from the
    * mean's denominator). Exactness per the engine convention: each pass
    * reads the previous pass's 6-dp values quantized to 1e-6 integers,
    * so the ≤9-term neighborhood sum is order-free exact; one divide,
    * one canonical round per pass. Plan shape per pass: one bounded
    * 9-way offset explode + hash aggregate + broadcast-or-shuffle-free
    * same-key left join — linear in cells at any raster size. */
  def gapfillSmooth(px: DataFrame, w: Int, maxDist: Int, iters: Int)
      : DataFrame = {
    val filled0 = gapfillIdw(px, w, maxDist)
      .select(col("col"), col("row"), col("filled").as("value"),
        lit(1).as("isf"))
    val valid = px.select(col("col"), col("row"), col("value"),
      lit(0).as("isf"))
    var cur = valid.unionAll(filled0)
    val offs = array((for (dr <- -1 to 1; dc <- -1 to 1)
      yield struct(lit(dc).as("dc"), lit(dr).as("dr"))): _*)
    for (_ <- 1 to iters) {
      val served = cur
        .select(col("col"), col("row"),
          floor(col("value") * 1e6 + 0.5).cast("double").as("v6"))
        .select(col("v6"), explode(offs).as("o"),
          (col("col") + col("o.dc")).as("col"),
          (col("row") + col("o.dr")).as("row"))
        .filter(col("col") >= 0 && col("col") < w &&
          col("row") >= 0 && col("row") < w)
        .select(col("col"), col("row"), col("v6"))
      val sm = served.groupBy("col", "row")
        .agg(round(sum("v6") / (count(lit(1)) * 1e6), 6).as("smoothed"))
      cur = cur.join(sm, Seq("col", "row"), "left")
        .select(col("col"), col("row"),
          when(col("isf") === 1, col("smoothed")).otherwise(col("value"))
            .as("value"),
          col("isf"))
    }
    cur.filter(col("isf") === 1)
      .select(col("col"), col("row"), col("value").as("filled"))
  }

  def gapfillSmoothSql(gridCte: String, w: Int, maxDist: Int, iters: Int)
      : String = {
    val L = lcmScale(maxDist)
    val base =
      s"""WITH g AS ($gridCte),
      full_grid AS (SELECT CAST(i % $w AS INT) AS col, CAST(i // $w AS INT) AS "row"
                    FROM (SELECT unnest(range(${w.toLong * w})) AS i)),
      missing AS (SELECT f.col, f."row" FROM full_grid f
                  ANTI JOIN g ON g.col = f.col AND g."row" = f."row"),
      served AS (SELECT g.col + dc AS col, g."row" + dr AS "row",
                        CAST($L // (dc*dc + dr*dr) AS DOUBLE) AS wi,
                        floor(value * 1000000.0 + 0.5) AS v6
                 FROM g,
                      (SELECT unnest(range(-$maxDist, ${maxDist + 1})) AS dc),
                      (SELECT unnest(range(-$maxDist, ${maxDist + 1})) AS dr)
                 WHERE NOT (dc = 0 AND dr = 0)),
      f0 AS (SELECT m.col, m."row",
                    round(sum(v6 * wi) / (sum(wi) * 1000000.0), 6) AS value
             FROM missing m JOIN served s ON s.col = m.col AND s."row" = m."row"
             GROUP BY 1, 2),
      c0 AS (SELECT col, "row", value, 0 AS isf FROM g
             UNION ALL SELECT col, "row", value, 1 AS isf FROM f0)"""
    val passes = (1 to iters).map { k =>
      s""",
      s$k AS (SELECT c.col + dc AS col, c."row" + dr AS "row",
                     floor(c.value * 1000000.0 + 0.5) AS v6
              FROM c${k - 1} c,
                   (SELECT unnest(range(-1, 2)) AS dc),
                   (SELECT unnest(range(-1, 2)) AS dr)
              WHERE c.col + dc >= 0 AND c.col + dc < $w
                AND c."row" + dr >= 0 AND c."row" + dr < $w),
      m$k AS (SELECT col, "row",
                     round(sum(v6) / (count(*) * 1000000.0), 6) AS smoothed
              FROM s$k GROUP BY 1, 2),
      c$k AS (SELECT c.col, c."row",
                     CASE WHEN c.isf = 1 THEN m.smoothed ELSE c.value END AS value,
                     c.isf
              FROM c${k - 1} c LEFT JOIN m$k m
                ON m.col = c.col AND m."row" = c."row")"""
    }.mkString
    s"""$base$passes
    SELECT col, "row", value AS filled FROM c$iters WHERE isf = 1"""
  }

  def gapfillIdwSql(gridCte: String, w: Int, maxDist: Int): String = {
    val L = lcmScale(maxDist)
    s"""WITH g AS ($gridCte),
    full_grid AS (SELECT CAST(i % $w AS INT) AS col, CAST(i // $w AS INT) AS "row"
                  FROM (SELECT unnest(range(${w.toLong * w})) AS i)),
    missing AS (SELECT f.col, f."row" FROM full_grid f
                ANTI JOIN g ON g.col = f.col AND g."row" = f."row"),
    served AS (SELECT g.col + dc AS col, g."row" + dr AS "row",
                      CAST($L // (dc*dc + dr*dr) AS DOUBLE) AS wi,
                      floor(value * 1000000.0 + 0.5) AS v6
               FROM g,
                    (SELECT unnest(range(-$maxDist, ${maxDist + 1})) AS dc),
                    (SELECT unnest(range(-$maxDist, ${maxDist + 1})) AS dr)
               WHERE NOT (dc = 0 AND dr = 0))
    SELECT m.col, m."row",
           round(sum(v6 * wi) / (sum(wi) * 1000000.0), 6) AS filled
    FROM missing m JOIN served s ON s.col = m.col AND s."row" = m."row"
    GROUP BY 1, 2"""
  }
}
