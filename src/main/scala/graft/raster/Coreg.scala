package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DEM co-registration, Nuth & Kääb (2011) — the estimate/apply pair the
  * composed pipeline runs BEFORE differencing (the reference assumes its
  * inputs are already co-registered, differencing_functions.py:69–79;
  * xdem/demcoreg run exactly this step upstream).
  *
  * Model: a horizontal misregistration (dx, dy) plus vertical bias dz
  * leaves the first-order signature  dh ≈ dx·∂z/∂x + dy·∂z/∂y + dz  on
  * the difference — the classic tan(slope)·cos/sin(aspect) regression in
  * gradient components (trig-free). [[fit]] solves the 3-parameter least
  * squares from NINE power sums in one aggregation (the only driver-side
  * data is that 1-row aggregate); [[applyShift]] resamples the moving
  * DEM at the corrected coordinates with the engine's fixed-order
  * bilinear corner pivot.
  *
  * Scale shape: fit = one map-side-partial aggregation over the
  * difference table; apply = one equi-join on cell keys with a 4-corner
  * explode — both are the shapes that survive a 100-TB pixel table.
  * The oracle-gated twin is `r_coreg_nuthkaab` (QueriesRaster), which
  * inlines the same normal equations under binary-fraction quantization
  * for bit-exact DuckDB parity.
  */
object Coreg {

  final case class Fit(dx: Double, dy: Double, dz: Double,
                       n: Long, rms: Double)

  /** Outcome of [[iterate]]: the accumulated shift, the per-round fits,
    * the aligned DEM, and whether the loop actually CONVERGED (last
    * increment under tol) as opposed to exhausting maxIter — callers
    * must not treat an exhausted budget as a registration. */
  final case class IterResult(total: Fit, steps: Seq[Fit],
                              aligned: DataFrame, converged: Boolean)

  /** Estimate (dx, dy, dz) from DEM A (`col, row, value`) and the
    * grid-aligned difference `dh` (`col, row, value` = B − A). Gradients
    * are Horn 3×3 on A (interior cells only). */
  def fit(demA: DataFrame, dh: DataFrame, res: Double = 1.0): Fit = {
    val g = Terrain.neighborhood(demA)
      .select(col("col"), col("row"),
        Terrain.gx(res).as("gx"), Terrain.gy(res).as("gy"))
      .join(dh.select(col("col"), col("row"), col("value").as("dh")),
        Seq("col", "row"))
    val s = g.agg(
      count(lit(1)).cast("double").as("n"),
      sum("gx").as("sgx"), sum("gy").as("sgy"),
      sum(col("gx") * col("gx")).as("sxx"),
      sum(col("gx") * col("gy")).as("sxy"),
      sum(col("gy") * col("gy")).as("syy"),
      sum("dh").as("sdh"),
      sum(col("gx") * col("dh")).as("sxd"),
      sum(col("gy") * col("dh")).as("syd"),
      sum(col("dh") * col("dh")).as("sdd")).head()
    val (n, sgx, sgy, sxx, sxy, syy, sdh, sxd, syd, sdd) =
      (s.getDouble(0), s.getDouble(1), s.getDouble(2), s.getDouble(3),
        s.getDouble(4), s.getDouble(5), s.getDouble(6), s.getDouble(7),
        s.getDouble(8), s.getDouble(9))
    require(n >= 3, s"co-registration needs >= 3 interior cells, got $n")
    val det = sxx * (syy * n - sgy * sgy) - sxy * (sxy * n - sgy * sgx) +
      sgx * (sxy * sgy - syy * sgx)
    require(math.abs(det) > 1e-12, "degenerate terrain: gradient basis is singular")
    val dx = (sxd * (syy * n - sgy * sgy) - sxy * (syd * n - sgy * sdh) +
      sgx * (syd * sgy - syy * sdh)) / det
    val dy = (sxx * (syd * n - sgy * sdh) - sxd * (sxy * n - sgy * sgx) +
      sgx * (sxy * sdh - syd * sgx)) / det
    val dz = (sxx * (syy * sdh - syd * sgy) - sxy * (sxy * sdh - syd * sgx) +
      sxd * (sxy * sgy - syy * sgx)) / det
    val rms = math.sqrt(math.max(
      (sdd - dx * sxd - dy * syd - dz * sdh) / n, 0.0))
    Fit(dx, dy, dz, n.toLong, rms)
  }

  /** The full iterative Nuth–Kääb loop: fit, apply, re-fit on the
    * corrected pair, accumulate, until the fitted increment drops under
    * `tol` cells (the published algorithm iterates because the Taylor
    * linearization under-corrects large shifts; each round's residual
    * shrinks ~quadratically). Returns the TOTAL accumulated shift and
    * the per-iteration fits. Driver loop over a gated distributed
    * kernel — iterations are few (2–5) and each is one aggregation +
    * one resample join. */
  def iterate(demA: DataFrame, demB: DataFrame, maxIter: Int = 10,
              tol: Double = 0.02, res: Double = 1.0): IterResult = {
    require(maxIter >= 1, s"iterate needs at least one fit, got maxIter=$maxIter")
    def diff(b: DataFrame): DataFrame =
      demA.select(col("col"), col("row"), col("value").as("va"))
        .join(b.select(col("col"), col("row"), col("value").as("vb")),
          Seq("col", "row"))
        .select(col("col"), col("row"), (col("vb") - col("va")).as("value"))
    var cur = demB
    var totX = 0.0; var totY = 0.0
    val steps = scala.collection.mutable.ArrayBuffer.empty[Fit]
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val f = fit(demA, diff(cur), res)
      steps += f
      if (math.abs(f.dx) < tol && math.abs(f.dy) < tol) done = true
      else {
        totX += f.dx; totY += f.dy
        // localCheckpoint, not a bare .persist(): each round's resample
        // is consumed twice (fit + next apply) and lineage would
        // otherwise compound per round; the blocks are
        // ContextCleaner-scoped (reclaimed when the frame is GC'd), the
        // engine's convention for iterative intermediates
        // (Iterate.untilDelta, pagerank) — a bare persist here leaked
        // past releaseAll and CacheHygieneSpec caught it
        cur = applyShift(cur, f.dx, f.dy).localCheckpoint()
      }
      it += 1
    }
    val last = steps.last
    // only the horizontal shift is applied each round, so every fit
    // re-measures the SAME remaining vertical bias — the total dz is the
    // last fit's reading, not a sum
    IterResult(Fit(totX, totY, last.dz, last.n, last.rms), steps.toSeq,
      cur, converged = done)
  }

  /** Correct DEM B by a [[fit]]: B was found displaced by (sx, sy, sz),
    * i.e. B(c, r) ≈ A(c + sx, r + sy) + sz, so the aligned version is
    * B evaluated at `(col − sx, row − sy)` minus `sz` — pass the fit's
    * (dx, dy, dz) directly, the negation lives here. Fixed-order 2×2
    * corner pivot (the PixelGrid.regridBilinear discipline — a plain
    * sum() would accumulate corners in engine-dependent row order);
    * cells whose 4 corners all fall outside src's support drop
    * (shrinking support is the honest edge behavior of a shifted
    * resample).
    *
    * PRECONDITION: `src` has at most ONE row per (col, row) — the
    * corner pivot's max(when(...)) picks arbitrarily among duplicates
    * (e.g. overlapping mosaic tiles), yielding wrong bilinear values
    * rather than failing. Deduplicate overlaps upstream (the mosaic
    * reader's tile_id disambiguates); a defensive groupBy-count here
    * would charge every call a full extra shuffle for a contract the
    * writer already enforces. */
  def applyShift(src: DataFrame, sx: Double, sy: Double,
                 sz: Double = 0.0): DataFrame = {
    val tgt = src.select(col("col").as("tc"), col("row").as("tr"))
      .withColumn("fx", col("tc") - sx)
      .withColumn("fy", col("tr") - sy)
      .withColumn("dx", explode(array(lit(0), lit(1))))
      .withColumn("dy", explode(array(lit(0), lit(1))))
      .withColumn("scol", (floor(col("fx")) + col("dx")).cast("int"))
      .withColumn("srow", (floor(col("fy")) + col("dy")).cast("int"))
      .withColumn("w",
        (lit(1.0) - abs(col("fx") - col("scol"))) *
          (lit(1.0) - abs(col("fy") - col("srow"))))
    def cw(x: Int, y: Int): Seq[Column] = Seq(
      max(when(col("dx") === x && col("dy") === y, col("w") * col("value"))).as(s"c$x$y"),
      max(when(col("dx") === x && col("dy") === y, col("w"))).as(s"w$x$y"))
    val joined = tgt.join(
      src.withColumnRenamed("col", "scol").withColumnRenamed("row", "srow"),
      Seq("scol", "srow"), "inner")
    val aggs = Seq((0, 0), (0, 1), (1, 0), (1, 1)).flatMap { case (x, y) => cw(x, y) }
    val piv = joined.groupBy(col("tc").as("col"), col("tr").as("row"))
      .agg(aggs.head, aggs.tail: _*)
    def z(c: String) = coalesce(col(c), lit(0.0))
    piv
      .filter(z("w00") + z("w01") + z("w10") + z("w11") > 0.0)
      .select(col("col"), col("row"),
        ((z("c00") + z("c01") + z("c10") + z("c11")) /
          (z("w00") + z("w01") + z("w10") + z("w11")) - sz).as("value"))
  }
}
