package graft

import org.apache.spark.sql.functions._
import graft.rng.Rand

/** Scale probe for the STREAMING dh/dt twin under the RocksDB state
  * store — the configuration a 100-TB deployment actually runs
  * (StreamTrend's state lives off-heap/on-disk per key shard instead of
  * in executor heap). The oracle-gated parity mechanism is proven at
  * fixture scale by StreamTrendSpec; this main measures the claim that
  * was previously only asserted in a comment: per-pixel OLS state at
  * P≈10⁷ pixels, one DEM epoch per micro-batch, with
  *  - per-batch wall + state-store row counts from the query progress,
  *  - RocksDB file sizes (the state actually left the heap),
  *  - and END-TO-END hash parity: the per-pixel final sums collected
  *    from the update-mode emissions equal the batch six-aggregate
  *    shuffle bit-for-bit (values are k/1024 binary fractions, so the
  *    incremental adds ARE the batch sums in any arrival order).
  *
  * Usage: runMain graft.StreamScale [P] [K]   (default 10000000 5)
  * Epochs 1..K-2 drop ~20% of pixels (missing-data realism); epochs 0
  * and K-1 are complete so every pixel's state sees the final epoch.
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val p = args.headOption.map(_.toLong).getOrElse(10000000L)
    val k = if (args.length > 1) args(1).toInt else 5
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "64")
    val spark = Sessions.builder("local[32]", parts)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("strend_scale")
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ckDir = s"$root/ck"

    // deterministic epoch table: y = trend(pix)·e + noise(pix,e), all
    // binary fractions (k/1024) — the exactness contract's currency
    def epoch(e: Int) = {
      val base = spark.range(0, p, 1, parts.toInt)
        .select(col("id").as("pix"), lit(e.toLong).as("e"),
          (((Rand.mix(col("id"), 21) % 256).cast("double") / 1024.0 - 0.125) * e
            + (Rand.mix(col("id") * k + e, 22) % 64).cast("double") / 1024.0).as("y"))
      if (e == 0 || e == k - 1) base
      else base.filter(Rand.mix(col("pix") + e * 7919L, 23) % 10 < 8)
    }
    // stage one parquet delivery per epoch, written in order (the
    // staged-mosaic arrival convention; parity is arrival-order-exact
    // anyway, so cross-epoch batching by the file source is harmless)
    for (e <- 0 until k) epoch(e).coalesce(4).write.parquet(s"$inDir/e$e")
    val files = new java.io.File(inDir).listFiles().flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))).map(_.length())
    println(f"STREAM_SCALE staged P=$p%d K=$k%d files=${files.length}%d " +
      f"bytes=${files.sum}%d")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pix", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("e", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.DoubleType)))
    val obs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4") // = one staged epoch per batch
      .parquet(s"$inDir/*")
      .as[graft.streaming.StreamTrend.Obs]

    val t0 = System.nanoTime()
    val q = graft.streaming.StreamTrend.sumsStateful(obs)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckDir)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.StreamTrend.Sums], id: Long) =>
        // update-mode emissions land in an append log; the final sums
        // per pixel are recovered below as the max-n emission (n grows
        // strictly on every emission of a pixel)
        df.write.mode("append").parquet(outDir); ()
      }
      .start()
    // all deliveries are staged up front: processAllAvailable blocks
    // through every (k-epoch) micro-batch until the source is drained
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    q.recentProgress.filter(_.numInputRows > 0).foreach { pr =>
      val so = pr.stateOperators.headOption
      val rocks = so.map { s =>
        val m = s.customMetrics
        val sst = Option(m.get("rocksdbSstFileSize")).map(_.longValue).getOrElse(-1L)
        // Spark 4.1's RocksDB provider reports pinned-block memory as a
        // custom metric; the generic memoryUsedBytes is the provider's
        // own estimate of loaded state
        val pinned = Option(m.get("rocksdbPinnedBlocksMemoryUsage"))
          .map(_.longValue).getOrElse(-1L)
        f"sstBytes=$sst%d memBytes=${s.memoryUsedBytes}%d pinnedBytes=$pinned%d"
      }.getOrElse("")
      println(f"STREAM_SCALE batch=${pr.batchId}%d rows=${pr.numInputRows}%d " +
        f"batchMs=${pr.batchDuration}%d stateRows=${so.map(_.numRowsTotal).getOrElse(-1L)}%d $rocks")
    }
    println(f"STREAM_SCALE total wall=$wall%.1f s for ${p * k}%d max obs")

    // parity: final streamed sums (max-n emission per pixel) vs the
    // batch six-aggregate shuffle over the SAME epoch tables
    val emissions = spark.read.parquet(outDir)
    val finalSums = emissions.groupBy("pix")
      .agg(max(struct(col("n"), col("st"), col("stt"), col("sy"),
        col("sty"), col("syy"))).as("s"))
      .select(col("pix"), col("s.n"), col("s.st"), col("s.stt"),
        col("s.sy"), col("s.sty"), col("s.syy"))
    val batch = (0 until k).map(epoch).reduce(_ union _)
      .select(col("pix"), col("e").cast("double").as("t"), col("y"))
      .groupBy("pix")
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
        sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"),
        sum(col("y") * col("y")).as("syy"))
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent AND overflow-free under ANSI
      // (sum of 10^7 xxhash64 values overflows long)
      val r = df.select(xxhash64(col("pix"), col("n"), col("st"),
          col("stt"), col("sy"), col("sty"), col("syy")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (sn, sh) = checksum(finalSums)
    val (bn, bh) = checksum(batch)
    println(f"STREAM_SCALE parity stream=($sn%d, $sh%d) batch=($bn%d, $bh%d) " +
      f"match=${sn == bn && sh == bh}%b")
    require(sn == bn && sh == bh, "streamed state diverged from the batch aggregates")
    spark.stop()
  }
}
