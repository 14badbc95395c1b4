package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.geom.PointInPolygon

/** Optimizer rule: under any `Filter` whose condition conjunctively
  * contains `point_in_polygon(x, y, <literal polygon>)`, inject the
  * polygon's bounding-box range predicates on x and y.
  *
  * Why a Rule and not query-author discipline: the ray-casting predicate
  * is a per-row loop no storage layer understands, so on its own it scans
  * everything. Its bbox, by contrast, is four attribute-vs-literal
  * comparisons — exactly what predicate pushdown turns into parquet
  * row-group skipping (PushedFilters) and, on a spatially partitioned/
  * Z-ordered 100-TB layout, partition pruning. The rewrite is sound
  * because ray-casting containment implies bbox containment, and
  * idempotent because already-present conjuncts are `semanticEquals`-
  * deduplicated (the optimizer runs rules to fixpoint).
  *
  * Scope: positive top-level conjuncts with a FOLDABLE vertex array
  * (polygons under Not/Or, or vertices flowing from a relation — e.g.
  * the broadcast side of a spatial join — are left untouched).
  *
  * Wiring: `graft.plans.GraftExtensions` via `spark.sql.extensions`
  * (all the engine's mains set it), or
  * `spark.experimental.extraOptimizations` for an existing session.
  */
object PipBboxPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def bounds(verts: Expression): Option[(Double, Double, Double, Double)] =
    if (!verts.foldable) None
    else verts.eval(null) match {
      case arr: ArrayData if arr.numElements() > 0 =>
        var minx = Double.PositiveInfinity; var maxx = Double.NegativeInfinity
        var miny = Double.PositiveInfinity; var maxy = Double.NegativeInfinity
        var i = 0
        while (i < arr.numElements()) {
          val v = arr.getStruct(i, 2)
          val x = v.getDouble(0); val y = v.getDouble(1)
          if (x < minx) minx = x; if (x > maxx) maxx = x
          if (y < miny) miny = y; if (y > maxy) maxy = y
          i += 1
        }
        Some((minx, maxx, miny, maxy))
      case _ => None
    }

  private def bbox(pip: PointInPolygon): Seq[Expression] =
    bounds(pip.third).toSeq.flatMap { case (minx, maxx, miny, maxy) =>
      Seq(
        GreaterThanOrEqual(pip.first, Literal(minx)),
        LessThanOrEqual(pip.first, Literal(maxx)),
        GreaterThanOrEqual(pip.second, Literal(miny)),
        LessThanOrEqual(pip.second, Literal(maxy)))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val adds = conjuncts
        .collect { case pip: PointInPolygon => pip }
        .flatMap(bbox)
        .filterNot(a => conjuncts.exists(_.semanticEquals(a)))
      if (adds.isEmpty) f
      else Filter((adds ++ conjuncts).reduce(And), child)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PipBboxPrefilter)
}
