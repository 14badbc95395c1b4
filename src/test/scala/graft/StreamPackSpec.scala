package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.queries.QueriesPipe
import graft.streaming.StreamPack

/** The stateful streaming packer must emit exactly the batch
  * x_pack_chunks rows, and its per-shard running count must survive a
  * micro-batch boundary: docs appended in a second file (higher doc_ids,
  * the append-log contract) get the spans the batch operator assigns
  * them when run over the full union. */
class StreamPackSpec extends SparkSuite {
  import spark.implicits._

  private def docsOf(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)

  private def cmp(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "lang", "n_tokens", "start_chunk", "end_chunk", "straddles")
      .orderBy("lang", "doc_id").collect()

  test("streamed packing equals batch x_pack_chunks across micro-batches") {
    val dir = Files.createTempDirectory("graft-spack").toFile
    dir.deleteOnExit()
    Files.copy(Paths.get(s"$sf001/documents.parquet"),
      Paths.get(dir.getAbsolutePath, "part-000.parquet"))

    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val stream = docsOf(spark.readStream.schema(schema)
      .parquet(dir.getAbsolutePath)).as[StreamPack.Doc]

    val q = StreamPack.packStateful(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("spack_test").start()
    try {
      q.processAllAvailable()
      val base = Tables.documents(spark, sf001)
      val batch1 = cmp(SparkEntry.queries("x_pack_chunks")(spark, sf001))
      val got1 = cmp(spark.table("spack_test"))
      assert(got1.length == batch1.length, s"${got1.length} vs ${batch1.length}")
      got1.zip(batch1).foreach { case (a, b) => assert(a == b, s"$a != $b") }

      // second micro-batch: clone 20 docs to fresh ids past the max —
      // their spans must continue each shard's carried token count
      val maxId = base.agg(max("doc_id")).head().getLong(0)
      val extra = base.filter(col("text").isNotNull).limit(20)
        .withColumn("doc_id", col("doc_id") + maxId + 1)
      extra.write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()

      val full = base.unionByName(extra)
      val batch2 = cmp(QueriesPipe.packOn(full))
      val got2 = cmp(spark.table("spack_test"))
      assert(got2.length == batch2.length, s"${got2.length} vs ${batch2.length}")
      got2.zip(batch2).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    } finally q.stop()
  }
}
