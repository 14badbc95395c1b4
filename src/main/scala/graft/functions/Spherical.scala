package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Nested spherical variogram model — pure column-expression builders
  * (no UDF: stays inside whole-stage codegen; SURVEY.md §2.11).
  *
  * γ(h) = nugget + Σ_i C_i · (1.5·h/a_i − 0.5·(h/a_i)³)  for h < a_i
  *                 C_i                                    for h ≥ a_i
  * (variography_uncertainty.py:574–607; nugget always last, :597–607)
  * Covariance C(h) = σ²_tot − γ(h) (:1049–1055);
  * correlation ρ(h) = 1 − γ(h)/σ²_tot (:1359–1360).
  */
case class SphericalModel(sills: Seq[Double], ranges: Seq[Double], nugget: Double) {
  require(sills.length == ranges.length)
  val totalSill: Double = sills.sum + nugget

  /** Driver-side scalar twin of [[gamma]]. */
  def gammaTotal(h: Double): Double =
    nugget + sills.zip(ranges).map { case (c, a) =>
      if (h < a) c * (1.5 * h / a - 0.5 * math.pow(h / a, 3)) else c
    }.sum

  def gamma(h: Column): Column =
    sills.zip(ranges).foldLeft(lit(nugget): Column) { case (acc, (c, a)) =>
      acc + when(h < a,
        lit(c) * (lit(1.5) * h / a - lit(0.5) * pow(h / a, 3))).otherwise(lit(c))
    }

  def gammaSql(h: String): String =
    sills.zip(ranges).foldLeft(nugget.toString) { case (acc, (c, a)) =>
      s"$acc + (CASE WHEN $h < $a THEN $c * (1.5 * $h / $a - 0.5 * pow($h / $a, 3)) ELSE $c END)"
    }

  def cov(h: Column): Column = lit(totalSill) - gamma(h)
  def covSql(h: String): String = s"($totalSill - (${gammaSql(h)}))"

  def rho(h: Column): Column = lit(1.0) - gamma(h) / totalSill
  def rhoSql(h: String): String = s"(1.0 - (${gammaSql(h)}) / $totalSill)"
}

object Spherical {
  /** Canonical two-component + nugget model used by the oracle-checked
    * uncertainty queries (shape mirrors notebook cell 78 fits). */
  val canonical: SphericalModel =
    SphericalModel(sills = Seq(0.04, 0.02), ranges = Seq(90.0, 300.0), nugget = 0.005)
}
