package graft

import org.apache.spark.sql.functions._
import graft.raster.{Terrain, TiledGapfill}
import graft.zonal.Zonal

class TiledGapfillSpec extends SparkSuite {
  import spark.implicits._

  test("halo-tile gapfill: constant field fills constant across tile borders") {
    val w = 40 // 16-tile grid boundaries at 16 and 32 sit inside the raster
    val px = (for (r <- 0 until w; c <- 0 until w if (c * 31 + r * 17) % 5 != 0)
      yield (c, r, 7.25)).toDF("col", "row", "value")
    val filled = TiledGapfill.gapfillIdwTiled(px, w, 3, tile = 16).collect()
    assert(filled.nonEmpty)
    filled.foreach(r => assert(r.getDouble(2) == 7.25,
      s"constant-field fill must be the constant, got $r"))
  }

  test("halo-tile gapfill ≡ offset-explode gapfill, bit for bit") {
    val w = 37 // not a tile multiple: exercises clipped edge tiles
    val px = (for (r <- 0 until w; c <- 0 until w if (c * 13 + r * 29) % 3 != 0)
      yield (c, r, ((c * 7919 + r * 104729) % 1000) / 7.0)).toDF("col", "row", "value")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val join = asSet(Terrain.gapfillIdw(px, w, 3))
    val tiled = asSet(TiledGapfill.gapfillIdwTiled(px, w, 3, tile = 16))
    assert(join == tiled,
      s"halo-tile kernel diverged: only-join=${(join -- tiled).take(3)} " +
        s"only-tiled=${(tiled -- join).take(3)}")
  }

  test("gapfillSmooth: constant field is a fixed point; zero iters = plain fill") {
    val w = 24
    val px = (for (r <- 0 until w; c <- 0 until w if (c * 31 + r * 17) % 5 != 0)
      yield (c, r, 7.25)).toDF("col", "row", "value")
    // constant field: every 3x3 mean is the constant, any iteration count
    Terrain.gapfillSmooth(px, w, 3, iters = 2).collect()
      .foreach(r => assert(r.getDouble(2) == 7.25, s"smoothing moved a constant: $r"))
    // iters = 0 degenerates to the plain IDW fill
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val vary = (for (r <- 0 until w; c <- 0 until w if (c * 13 + r * 29) % 3 != 0)
      yield (c, r, ((c * 7919 + r * 104729) % 1000) / 7.0)).toDF("col", "row", "value")
    assert(asSet(Terrain.gapfillSmooth(vary, w, 3, iters = 0)) ==
      asSet(Terrain.gapfillIdw(vary, w, 3).withColumnRenamed("filled", "value")
        .select(col("col"), col("row"), col("value").as("filled"))))
    // smoothing changes SOME filled value on a varying field, fills the
    // same cell set, and never touches a valid pixel (by construction
    // the output contains only filled cells)
    val f0 = asSet(Terrain.gapfillSmooth(vary, w, 3, iters = 0))
    val f2 = asSet(Terrain.gapfillSmooth(vary, w, 3, iters = 2))
    assert(f0.map(t => (t._1, t._2)) == f2.map(t => (t._1, t._2)),
      "smoothing must preserve the filled-cell set")
    assert(f0 != f2, "2 smoothing passes on a varying field must move values")
  }

  test("statsWithMode analyzes in a DEFAULT session (no failAmbiguousSelfJoin dependency)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.analyzer.failAmbiguousSelfJoin", "true")
    val tagged = s2.createDataFrame(Seq(
      ("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0)))
      .toDF("name", "v")
    val out = Zonal.statsWithMode(() => tagged, "v").collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("ALL", "a", "b"))
  }
}
