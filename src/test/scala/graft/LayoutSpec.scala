package graft

import org.apache.spark.sql.functions._
import graft.raster.{Layout, PixelGrid}

/** Proves the ARCHITECTURE.md layout claim at the plan level: bucketed
  * pixel tables make the differencing join shuffle-free. */
class LayoutSpec extends SparkSuite {

  test("bucketed rasters difference without a shuffle exchange") {
    val a = PixelGrid.grid(spark, sf001, 0)
    val b = PixelGrid.grid(spark, sf001, 1)
    // unbucketed: the join must exchange both sides
    val plain = PixelGrid.difference(a, b)
    assert(Layout.hasShuffle(plain), "expected shuffle on unbucketed join")

    // clean any stale table locations from previous JVMs (fresh in-memory
    // catalog + surviving warehouse dir → LOCATION_ALREADY_EXISTS)
    Seq("px_a_test", "px_b_test").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Layout.saveBucketed(a, "px_a_test")
    Layout.saveBucketed(b, "px_b_test")
    val ab = Layout.load(spark, "px_a_test")
    val bb = Layout.load(spark, "px_b_test")
    val bucketed = PixelGrid.difference(ab, bb)
    assert(!Layout.hasShuffle(bucketed),
      s"bucketed join still shuffles:\n${bucketed.queryExecution.executedPlan}")
    // and the results agree
    assert(bucketed.count() == plain.count())
    val s1 = plain.agg(sum(abs(col("dz")))).head().getDouble(0)
    val s2 = bucketed.agg(sum(abs(col("dz")))).head().getDouble(0)
    assert(math.abs(s1 - s2) < 1e-6)
  }

  test("sorted write: partition dirs, in-file sort order, file size cap") {
    val out = java.nio.file.Files.createTempDirectory("layout_sorted").toString
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_type"), col("event_id"), col("user_id"))
    Layout.saveSorted(ev, out, "event_type", Seq("event_id"), 100L)
    // partition pruning layout: one directory per event_type value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_type=")).sorted
    assert(dirs.length == 5, dirs.mkString(","))
    // file cap: no parquet file holds more than maxRecordsPerFile rows;
    // in-file order: event_id is non-decreasing within every file
    val withFile = spark.read.parquet(out)
      .select(col("event_id"), input_file_name().as("f"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val byFile = withFile.groupBy(_._1)
    assert(byFile.size >= 10, s"expected ≥2 capped files per partition, got ${byFile.size}")
    for ((f, rows) <- byFile) {
      assert(rows.length <= 100, s"$f has ${rows.length} rows > cap")
      val ids = rows.map(_._2) // parquet preserves write order within a file
      assert(ids.sameElements(ids.sorted), s"$f not sorted by event_id")
    }
    // nothing lost
    assert(withFile.length == ev.count())
  }
}
