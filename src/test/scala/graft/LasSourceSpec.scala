package graft

import graft.ingest.Las

class LasSourceSpec extends SparkSuite {

  private def stage(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("las_dsv2_spec").toFile
    // tile 0: LAS 1.2 format 1 (with gps times)
    val t12 = Array((1.5, 2.5, 100.0, 2, 7.25), (17.0, 3.0, 101.5, 1, 8.5))
    java.nio.file.Files.write(new java.io.File(dir, "a.las").toPath,
      Las.encodeTimed(t12))
    // tile 1: LAS 1.4 format 6
    val t14 = Array(
      Las.P6(40.0, 5.0, 110.0, 9, 2, 3, 1, 7, -100, 4, 315964800.5),
      Las.P6(60.25, 6.5, 99.999999, 0, 1, 1, 0, 2, 0, 0, -1.25))
    java.nio.file.Files.write(new java.io.File(dir, "b.las").toPath,
      Las.encode14(t14))
    // a non-.las file in the directory is ignored, not misparsed
    java.nio.file.Files.write(new java.io.File(dir, "readme.txt").toPath,
      "not a point cloud".getBytes)
    dir
  }

  test("mixed 1.2/1.4 directory reads as one table, one partition per file") {
    val dir = stage()
    val df = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq ==
      Seq("x", "y", "z", "classification", "gps_time"))
    assert(df.rdd.getNumPartitions == 2, "one InputPartition per .las file")
    val rows = df.collect().map(r => (r.getDouble(0), r.getInt(3),
      r.getDouble(4))).sortBy(_._1).toSeq
    def q(v: Double) = math.floor(v / Las.Scale + 0.5) * Las.Scale
    assert(rows == Seq((q(1.5), 2, 7.25), (q(17.0), 1, 8.5),
      (q(40.0), 7, 315964800.5), (q(60.25), 2, -1.25)))
  }

  test("column pruning is pushed into the scan") {
    val dir = stage()
    val pruned = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath)
      .select("x", "classification")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("x") && !plan.contains("gps_time"),
      s"gps_time survived pruning:\n$plan")
    assert(pruned.collect().length == 4)
  }

  test("write connector round-trips through the read connector") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("las_dsv2_w").toFile
    val pts = Seq(
      (1.25, 2.5, 100.0, 2, 5.5), (3.75, 4.0, 101.25, 1, 6.5),
      (10.0, 11.0, 99.5, 7, 7.5), (12.5, 13.0, 98.0, 2, 8.5))
    pts.toDF("x", "y", "z", "classification", "gps_time")
      .repartition(2)
      .write.format("graft.sources.LasSource").mode("append")
      .save(dir.getAbsolutePath)
    val files = dir.listFiles().filter(_.getName.endsWith(".las")).sortBy(_.getName)
    assert(files.length == 2, "one .las per partition")
    // even partition = LAS 1.2, odd = LAS 1.4 (mixed-vintage by design)
    val vers = files.map(f => java.nio.file.Files.readAllBytes(f.toPath)(25))
    assert(vers.toSet == Set(2.toByte, 4.toByte), s"versions ${vers.toSeq}")
    val back = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath)
      .collect().map(r => (r.getDouble(0), r.getInt(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    assert(back == pts.sortBy(_._1).map(p => (p._1, p._4, p._5)))
    // a wrong schema rejects at plan time, not as a corrupt file
    intercept[Exception] {
      Seq((1.0, 2.0)).toDF("x", "y")
        .write.format("graft.sources.LasSource").mode("append")
        .save(dir.getAbsolutePath)
    }
  }

  test("streaming read picks up new .las deliveries per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("las_dsv2_s").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.las").toPath,
      Las.encodeTimed(Array((1.0, 2.0, 100.0, 2, 1.5))))
    val q = spark.readStream.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath)
      .writeStream.outputMode("append")
      .format("memory").queryName("las_stream_test").start()
    try {
      q.processAllAvailable()
      assert(spark.table("las_stream_test").count() == 1)
      // second delivery, lexicographically later — next micro-batch only
      // plans the NEW file
      java.nio.file.Files.write(new java.io.File(dir, "b.las").toPath,
        Las.encode14(Array(
          Las.P6(5.0, 6.0, 101.0, 0, 1, 1, 0, 7, 0, 0, 2.5),
          Las.P6(7.0, 8.0, 102.0, 0, 1, 1, 0, 2, 0, 0, 3.5))))
      q.processAllAvailable()
      val rows = spark.table("las_stream_test").collect()
        .map(r => (r.getDouble(0), r.getInt(3))).sortBy(_._1).toSeq
      assert(rows == Seq((1.0, 2), (5.0, 7), (7.0, 2)))
    } finally q.stop()
  }

  test("compressed .laz deliveries dispatch per-file (1.2 and 1.4 layered)") {
    val dir = java.nio.file.Files.createTempDirectory("las_dsv2_laz").toFile
    // tile 0: LAZ 1.2 fmt 1 (POINT10+GPSTIME11)
    java.nio.file.Files.write(new java.io.File(dir, "a.laz").toPath,
      graft.ingest.Laz.encodeTimed(Array((1.5, 2.5, 100.0, 2, 7.25),
        (17.0, 3.0, 101.5, 1, 8.5))))
    // tile 1: native LAZ 1.4 fmt 6 (POINT14 layered)
    java.nio.file.Files.write(new java.io.File(dir, "b.laz").toPath,
      graft.ingest.Laz14.encode(Array(
        Las.P6(40.0, 5.0, 110.0, 9, 2, 3, 1, 7, -100, 4, 315964800.5),
        Las.P6(60.25, 6.5, 99.999999, 0, 1, 1, 0, 2, 0, 0, -1.25))))
    // tile 2: uncompressed 1.4 in the same directory — all three vintages
    java.nio.file.Files.write(new java.io.File(dir, "c.las").toPath,
      Las.encode14(Array(Las.P6(80.0, 1.0, 50.0, 0, 1, 1, 2, 5, 10, 1, 0.5))))
    val df = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 3, "one InputPartition per file")
    val rows = df.collect().map(r => (r.getDouble(0), r.getInt(3),
      r.getDouble(4))).sortBy(_._1).toSeq
    def q(v: Double) = math.floor(v / Las.Scale + 0.5) * Las.Scale
    assert(rows == Seq((q(1.5), 2, 7.25), (q(17.0), 1, 8.5),
      (q(40.0), 7, 315964800.5), (q(60.25), 2, -1.25), (q(80.0), 5, 0.5)))
  }

  test("filter pushdown reaches the decode loop: class + bbox skip decode work") {
    val dir = java.nio.file.Files.createTempDirectory("las_dsv2_push").toFile
    val pts = Array.tabulate(1000) { i =>
      (i.toDouble, (i % 100).toDouble, 100.0 + i, if (i % 10 == 0) 2 else 1,
        i * 0.5)
    }
    java.nio.file.Files.write(new java.io.File(dir, "a.las").toPath,
      Las.encodeTimed(pts))
    val base = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath)
    // class-only filter: only the 100 matching points fully materialize
    graft.sources.LasSource.decodedPoints.set(0L)
    val cls2 = base.filter(org.apache.spark.sql.functions.col("classification") === 2)
      .collect()
    assert(cls2.length == 100)
    assert(graft.sources.LasSource.decodedPoints.get() == 100,
      s"decoded ${graft.sources.LasSource.decodedPoints.get()} points, expected 100")
    // bbox crop composes with the class filter
    graft.sources.LasSource.decodedPoints.set(0L)
    val crop = base.filter("classification = 2 AND x >= 100.0 AND x < 300.0")
      .collect()
    assert(crop.length == 20)
    // 21, not 20: the strict x < 300 is widened to an inclusive bound in
    // the decode loop (x = 300 decodes), and Spark's residual drops it
    assert(graft.sources.LasSource.decodedPoints.get() == 21)
    // and Spark still re-applies the predicate (residual): values correct
    assert(crop.forall(r => r.getInt(3) == 2 && r.getDouble(0) >= 100.0 &&
      r.getDouble(0) < 300.0))
    // the pushed filters are visible on the scan
    val scanDesc = cls2 // re-plan to inspect
    val df = base.filter("classification = 2")
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.exists(_.toString.contains("las(")), "scan leaf present")
  }

  test("projection prunes LAZ14 layer decode through the connector") {
    val dir = java.nio.file.Files.createTempDirectory("las_dsv2_laz_prune").toFile
    val pts = Array.tabulate(500)(i =>
      Las.P6(i.toDouble, i * 2.0, 100.0 + i, i % 7, 1, 1, 0, i % 5, i % 30,
        i % 3, i * 0.25))
    java.nio.file.Files.write(new java.io.File(dir, "a.laz").toPath,
      graft.ingest.Laz14.encode(pts, chunkSize = 128))
    val xy = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath).select("x", "y")
    assert(xy.schema.fieldNames.toSeq == Seq("x", "y"), "pruned ReadSchema")
    val rows = xy.collect().map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.length == 500)
    for (i <- 0 until 500)
      assert(rows(i) == (i.toDouble, i * 2.0), s"row $i")
    // full projection still yields every channel through the same file
    val full = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath).orderBy("x").collect()
    assert(full.map(_.getInt(3)).toSeq == pts.sortBy(_.x).map(_.classification).toSeq)
  }

  test("streaming write path back-patches headers (large partition, exact readback)") {
    val dir = java.nio.file.Files.createTempDirectory("las_dsv2_stream_w").toFile
    import spark.implicits._
    val n = 50000
    val df = spark.range(n.toLong).select(
      ($"id" * 0.001).as("x"), ($"id" % 97).cast("double").as("y"),
      (org.apache.spark.sql.functions.lit(100.0) + $"id" % 13).as("z"),
      ($"id" % 5).cast("int").as("classification"),
      ($"id" * 0.5).as("gps_time"))
      .repartition(2)
    df.write.format("graft.sources.LasSource").mode("append")
      .save(dir.getAbsolutePath)
    val files = dir.listFiles().filter(_.getName.endsWith(".las")).sortBy(_.getName)
    assert(files.length == 2)
    // no temp litter
    assert(!dir.listFiles().exists(_.getName.endsWith(".tmp")))
    val back = spark.read.format("graft.sources.LasSource")
      .load(dir.getAbsolutePath)
    assert(back.count() == n.toLong)
    import org.apache.spark.sql.functions._
    val s = back.agg(sum(floor($"x" / 1e-6 + 0.5)).cast("long"),
      sum($"classification").cast("long")).head()
    val e = df.agg(sum(floor($"x" / 1e-6 + 0.5)).cast("long"),
      sum($"classification").cast("long")).head()
    assert(s == e, s"readback aggregate $s vs $e")
  }

  test("empty dir and junk bytes reject loudly") {
    val empty = java.nio.file.Files.createTempDirectory("las_dsv2_empty").toFile
    intercept[Exception] {
      spark.read.format("graft.sources.LasSource")
        .load(empty.getAbsolutePath).collect()
    }
    val junkDir = java.nio.file.Files.createTempDirectory("las_dsv2_junk").toFile
    java.nio.file.Files.write(new java.io.File(junkDir, "x.las").toPath,
      "LASF but truncated".getBytes)
    intercept[Exception] {
      spark.read.format("graft.sources.LasSource")
        .load(junkDir.getAbsolutePath).collect()
    }
  }

  test("stream offset JSON carries the last processed filename and accepts the legacy form") {
    import graft.sources.LasOffset
    val o = LasOffset(3, """part_0003 "v2"\final.las""")
    assert(LasOffset.parse(o.json()) == o, "escape round trip")
    assert(LasOffset.parse("7") == LasOffset(7, ""), "legacy bare-count offsets")
    intercept[IllegalArgumentException] { LasOffset.parse("not an offset") }
  }

  test("mutating an already-processed delivery fails the stream loudly (append-only guard)") {
    val dir = java.nio.file.Files.createTempDirectory("las_stream_mut").toFile
    def deliver(name: String): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        Las.encodeTimed(Array((1.0, 2.0, 100.0, 2, 1.5))))
    deliver("part_0001.las")
    deliver("part_0002.las")
    val stream = new graft.sources.LasMicroBatchStream(dir.getAbsolutePath,
      Array("x"), graft.sources.LasSource.NoFilter)
    val off1 = stream.latestOffset()
    assert(off1.json().contains("part_0002.las"))
    // rename a PROCESSED file: count-only offsets would silently reprocess
    val f2 = new java.io.File(dir, "part_0002.las")
    assert(f2.renameTo(new java.io.File(dir, "part_0000_renamed.las")))
    deliver("part_0003.las")
    val ex = intercept[IllegalArgumentException] {
      stream.planInputPartitions(off1, stream.latestOffset())
    }
    assert(ex.getMessage.contains("append-only"))
  }

  test("pinned artifacts resolve from the classpath anchor, not just CWD") {
    val p = graft.queries.QueriesRaster.pinnedFromClasspath(
      "tools/utm_expected.parquet")
    assert(new java.io.File(p).isFile)
    assert(p == new java.io.File("tools/utm_expected.parquet").getAbsolutePath)
  }
}
