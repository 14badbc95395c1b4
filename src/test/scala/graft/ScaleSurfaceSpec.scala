package graft

import org.apache.spark.sql.functions._
import graft.queries.{QueriesMl, QueriesSql}

/** Scale-surface evidence beyond the oracle gate: partition pruning at the
  * file-source level, JSONL source/sink fidelity, and invariance properties
  * (results must not depend on physical partitioning).
  */
class ScaleSurfaceSpec extends SparkSuite {

  test("date-partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toFile
    dir.deleteOnExit()
    val events = Tables.events(spark, sf001)
      .withColumn("event_date", to_date(col("ts")))
    events.write.mode("overwrite")
      .partitionBy("event_date").parquet(dir.getAbsolutePath)
    val allDates = events.select("event_date").distinct().count()
    val read = spark.read.parquet(dir.getAbsolutePath)
      .filter(col("event_date") === "2024-01-03")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"expected partition filters:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"partition filter list must not be empty:\n$plan")
    // the pruned scan must touch one date's files, not allDates'
    val scanned = read.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.partitionCount
    assert(scanned == 1, s"pruned to $scanned partitions (of $allDates)")
    assert(read.count() ==
      events.filter(col("event_date") === "2024-01-03").count())
  }

  test("JSONL sink → source roundtrip preserves the documents table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    dir.deleteOnExit()
    val docs = Tables.documents(spark, sf001)
    docs.write.mode("overwrite").json(dir.getAbsolutePath)
    val back = spark.read.schema(docs.schema).json(dir.getAbsolutePath)
    assert(back.schema == docs.schema)
    val a = docs.orderBy("doc_id").collect()
    val b = back.orderBy("doc_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("quadkey digits are a bijection: (col,row) recoverable from the key") {
    val rows = graft.raster.PixelGrid.grid(spark, sf001, 0)
      .select("col", "row").collect().map(r => (r.getInt(0), r.getInt(1)))
    def qk(c: Int, r: Int): String =
      (0 to 6).map(k => ((r >> (6 - k)) & 1) * 2 + ((c >> (6 - k)) & 1))
        .mkString("")
    val keys = rows.map { case (c, r) => qk(c, r) }
    assert(keys.distinct.length == rows.distinct.length, "quadkey collision")
    // invert: digit d at level k contributes bit (d&1) to col, (d>>1) to row
    rows.foreach { case (c, r) =>
      val k = qk(c, r)
      val c2 = k.zipWithIndex.map { case (d, i) => ((d - '0') & 1) << (6 - i) }.sum
      val r2 = k.zipWithIndex.map { case (d, i) => ((d - '0') >> 1) << (6 - i) }.sum
      assert(c2 == c && r2 == r, s"($c,$r) -> $k -> ($c2,$r2)")
    }
  }

  test("connected components: long path converges to one min-labeled cluster") {
    // a 40-node path has propagation diameter 39 — exercises multi-round
    // convergence, not just the 1-2 rounds near-dup clusters need
    import spark.implicits._
    val path = (0L until 39L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val cc = graft.text.DedupCluster.connectedComponents(path, maxIter = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.length == 40)
    assert(cc.forall(_._2 == 0L), "all nodes must take the min label 0")
    // two disjoint triangles stay separate
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("a_id", "b_id")
    val cc2 = graft.text.DedupCluster.connectedComponents(tri)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(0L, 1L, 2L).forall(cc2(_) == 0L))
    assert(Seq(10L, 11L, 12L).forall(cc2(_) == 10L))
    // non-convergence must throw, not silently split components
    intercept[IllegalStateException] {
      graft.text.DedupCluster.connectedComponents(path, maxIter = 3)
    }
  }

  test("m_auc and o_salted_join are invariant to input partitioning") {
    // shuffle partitions and table partitioning must not change results —
    // the determinism contract every query claims
    val base = QueriesMl.queries("m_auc")(spark, sf001)
      .orderBy("event_type").collect().toSeq
    val salted = QueriesSql.queries("o_salted_join")(spark, sf001)
      .orderBy("bucket").collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val again = QueriesMl.queries("m_auc")(spark, sf001)
        .orderBy("event_type").collect().toSeq
      val saltedAgain = QueriesSql.queries("o_salted_join")(spark, sf001)
        .orderBy("bucket").collect().toSeq
      assert(again == base, "m_auc changed under different partitioning")
      assert(saltedAgain == salted, "salted join changed under different partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("results are invariant to AQE on/off") {
    // adaptive execution changes physical plans (coalesced partitions,
    // runtime join strategy switches) — results must not move
    val probes = Seq("v_variogram", "m_auc", "r_zonal_stats", "x_dedup_minhash_lsh")
    def runAll(): Map[String, Seq[String]] = probes.map { q =>
      q -> SparkEntry.queries(q)(spark, sf001).collect().map(_.toString).sorted.toSeq
    }.toMap
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val base = runAll()
    try {
      spark.conf.set("spark.sql.adaptive.enabled",
        (!prev.toBoolean).toString)
      val flipped = runAll()
      probes.foreach(q => assert(flipped(q) == base(q), s"$q moved under AQE flip"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("frame sample offsets stay in payload bounds with full stride coverage") {
    val rows = graft.SparkEntry.queries("i_frame_sample")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Long]("offset_bytes")
      val len = r.getAs[Long]("byte_len")
      val hdr = r.getAs[String]("hdr_hex")
      assert(off >= 0 && off < len, s"offset $off out of [0, $len)")
      assert(hdr.length <= 16 && hdr.nonEmpty)
      assert(hdr.matches("[0-9A-F]+"), s"non-hex header $hdr")
    }
    // ≥1 frame per video; ≤4 by construction
    val perMedia = rows.groupBy(_.getAs[Long]("media_id")).values.map(_.length)
    assert(perMedia.forall(n => n >= 1 && n <= 4))
  }

  test("derived LSH/IVF widths hold occupancy bounds at every corpus size") {
    import graft.queries.{QueriesAnn, QueriesExt}
    // rplsh band bits: occupancy n/2^bits stays ≤ the 8-vector target
    // until the 16-bit cap, and the derivation is monotone in n
    var prev = 0
    for (n <- Seq(1L, 10L, 500L, 2000L, 20000L, 60000L, 200000L, 10000000L)) {
      val bits = QueriesExt.rpBitsFor(n)
      assert(bits >= 1 && bits <= 16)
      if (bits < 16)
        assert((n + 7) / 8 <= (1L << bits), s"n=$n bits=$bits occupancy>8")
      assert(bits >= prev, s"non-monotone at n=$n")
      prev = bits
    }
    // the measured-good design points reproduce
    assert(QueriesExt.rpBitsFor(2000L) == 8)   // sf0.1 = the r13 manual value
    assert(QueriesExt.rpBitsFor(20000L) == 12) // sf1
    // bands LUT: ≥4 everywhere, non-decreasing, capped at 16
    val lut = QueriesExt.rpBandsLut
    assert(lut.head == 4 && lut(8) == 4 && lut.max <= 16)
    assert(lut.sliding(2).forall(w => w(1) >= w(0)))
    // IVF dedup cluster count: floors at the 8-centroid fixture and
    // holds per-cluster occupancy ≤ 256 (the linear-pair-stage bound)
    assert(QueriesAnn.ivfKFor(500L) == 8 && QueriesAnn.ivfKFor(2000L) == 8)
    for (n <- Seq(20000L, 60000L, 1000000L)) {
      val k = QueriesAnn.ivfKFor(n)
      assert((n + k - 1) / k <= 256, s"n=$n k=$k occupancy>256")
    }
  }
}
