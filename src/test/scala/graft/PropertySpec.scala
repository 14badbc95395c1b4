package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.SphericalModel
import graft.raster.PixelGrid

/** Property-based tests (SURVEY.md §5 item 3) — raw ScalaCheck
  * generators driven with explicit seeds (the scalatestplus bridge is
  * not in the offline dependency cache). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val modelGen = for {
    n <- Gen.choose(1, 3)
    sills <- Gen.listOfN(n, Gen.choose(0.001, 1.0))
    ranges <- Gen.listOfN(n, Gen.choose(1.0, 500.0))
    nugget <- Gen.choose(0.0, 0.1)
  } yield SphericalModel(sills, ranges, nugget)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("spherical model: γ(0)=nugget, monotone, bounded by total sill") {
    val hsGen = Gen.listOfN(30, Gen.choose(0.0, 1000.0))
    samples(modelGen, 60).zip(samples(hsGen, 60)).foreach { case (m, hs) =>
      assert(math.abs(m.gammaTotal(0.0) - m.nugget) < 1e-12)
      val sorted = hs.sorted
      val gs = sorted.map(m.gammaTotal)
      gs.zip(gs.drop(1)).foreach { case (a, b) => assert(a <= b + 1e-12) }
      gs.foreach(g => assert(g <= m.totalSill + 1e-12))
      assert(math.abs(m.gammaTotal(1e9) - m.totalSill) < 1e-9)
    }
  }

  test("covariance + gamma = total sill and covariance stays in range") {
    samples(modelGen, 60).zip(samples(Gen.choose(0.0, 1000.0), 60))
      .foreach { case (m, h) =>
        val g = m.gammaTotal(h)
        val c = m.totalSill - g
        assert(math.abs((g + c) - m.totalSill) < 1e-12)
        assert(c <= m.totalSill + 1e-12 && c >= -1e-12)
      }
  }

  test("mask difference is disjoint from the kept set (EXCEPT semantics)") {
    val a = PixelGrid.grid(spark, sf001, 0)
    val b = PixelGrid.grid(spark, sf001, 1)
    val kept = PixelGrid.overlap(a, b)
    val dropped = a.select("col", "row").except(kept)
    assert(dropped.intersect(kept).count() == 0)
    assert(dropped.count() + kept.count() == a.count())
  }

  test("descriptive stats are invariant under pixel permutation") {
    val tagged = PixelGrid.grid(spark, sf001, 0)
      .select(lit("z").as("name"), col("value").as("v"))
    val statsA = graft.zonal.Zonal.descriptiveStats(tagged)
      .collect().map(_.toString).sorted.toSeq
    val shuffled = tagged.orderBy(rand(7)) // permute physical order
    val statsB = graft.zonal.Zonal.descriptiveStats(shuffled)
      .collect().map(_.toString).sorted.toSeq
    assert(statsA == statsB)
  }

  test("regrid preserves constant fields") {
    val const = spark.range(64L * 64)
      .select(($"id" % 64).cast("int").as("col"),
        ($"id" / 64).cast("int").as("row"), lit(7.25).as("value"))
    val re = PixelGrid.regridBilinear(const, 4, 16)
    val vals = re.select("value").distinct().as[Double].collect()
    assert(vals.toSeq == Seq(7.25))
  }

  test("bbox rule is sound and tight for random polygons") {
    // soundness on random data: for any polygon, the rule-injected bbox
    // keeps exactly the rows the plain PIP filter keeps; and the bbox is
    // tight (equals the vertex extremes)
    import graft.geom.Geom
    import graft.plans.PipBboxPrefilter
    val polyGen = for {
      n <- Gen.choose(3, 8)
      cx <- Gen.choose(20.0, 100.0)
      cy <- Gen.choose(20.0, 100.0)
      r <- Gen.choose(5.0, 19.0)
    } yield (0 until n).map { i =>
      val a = 2 * math.Pi * i / n
      // irrational-ish offsets keep vertices off the data lattice
      (cx + r * math.cos(a) + 0.137, cy + r * math.sin(a) + 0.261)
    } :+ { val a0 = 0.0; (cx + r * math.cos(a0) + 0.137, cy + r * math.sin(a0) + 0.261) }
    val px = PixelGrid.withXY(PixelGrid.grid(spark, sf001, 0)).persist()
    val prev = spark.experimental.extraOptimizations
    try {
      samples(polyGen, 12).foreach { pts =>
        val verts = Geom.polyLit(pts)
        spark.experimental.extraOptimizations = prev
        val base = px.filter(Geom.pointInPolygon(col("x"), col("y"), verts))
          .select("col", "row").collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
        spark.experimental.extraOptimizations = prev :+ PipBboxPrefilter
        val q = px.filter(Geom.pointInPolygon(col("x"), col("y"), verts))
        val ruled = q.select("col", "row").collect()
          .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
        assert(ruled == base, s"rule changed results for polygon $pts")
        val opt = q.queryExecution.optimizedPlan.toString
        val minx = pts.map(_._1).min
        assert(opt.contains(s">= $minx"), s"tight bbox min-x $minx missing:\n$opt")
      }
    } finally { spark.experimental.extraOptimizations = prev; px.unpersist() }
  }

  test("interval islands equal an imperative merge on random interval sets") {
    val caseGen = for {
      n <- Gen.choose(0, 60)
      iv <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 4L)
        st <- Gen.choose(0L, 500L)
        len <- Gen.choose(0L, 80L)
      } yield (u, st, st + len))
    } yield iv
    for ((ivs, seed) <- samples(caseGen, 30).zipWithIndex) {
      val rows = ivs.zipWithIndex.map { case ((u, st, en), i) => (u, i.toLong, st, en) }
      val got = graft.queries.QueriesPipe.intervalIslands(
          rows.toDF("user_id", "event_id", "st", "en"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val expected = rows.groupBy(_._1).map { case (u, g) =>
        val sorted = g.map { case (_, id, s, e) => (s, e, id) }.sorted
        var islands = List.empty[(Long, Long)]
        for ((s, e, _) <- sorted) islands match {
          case (is, ie) :: rest if s <= ie => islands = (is, math.max(ie, e)) :: rest
          case _ => islands = (s, e) :: islands
        }
        u -> ((islands.length.toLong, islands.map(i => i._2 - i._1).sum))
      }
      assert(got == expected, s"case $seed: $got vs $expected")
    }
  }
}
