package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{QuantileSketch, QuantileSketchAgg, TDigestState}
import graft.ingest.PointCloud

/** Ingest-lifecycle operators (SURVEY.md §3.1): point-cloud →
  * classification filters → DEM gridding, plus distinct-count surfaces.
  */
object QueriesIngest {
  type Q = (SparkSession, String) => DataFrame

  // §3.1 / §2.1: LAS-like points → noise drop → DTM/DSM cells
  private val pointcloudGrid: Q = (s, d) =>
    PointCloud.gridDem(PointCloud.points(s, d))
  private val pointcloudGridSql =
    PointCloud.gridDemSql(PointCloud.pointsSql)

  // §2.4 distinct counting (engine surface; exact form is oracle-gated,
  // approx_count_distinct is the 100-TB path — same query shape)
  private val countDistinctQ: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
  private val countDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
       FROM lineitem GROUP BY 1"""

  // multimodal metadata slice: binary payload sizes + kind distribution —
  // the oracle-checkable boundary of the multimodal pipeline (the decode
  // itself is the stubbed mapPartitions stage, tested in
  // StreamMultimodalSpec)
  private val multimodalMeta: Q = (s, d) =>
    graft.multimodal.Multimodal.mediaFromDocuments(s, d)
      .groupBy("kind", "meta_source")
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload")).cast("long")).as("total_bytes"),
        min(length(col("payload")).cast("long")).as("min_bytes"),
        max(length(col("payload")).cast("long")).as("max_bytes"))
  // Oracle sums are CAST to BIGINT: DuckDB sum(BIGINT) -> HUGEINT, which
  // serializes as a different physical type than Spark's LongType even
  // when the values agree (round-1 gate recorded hash_match:false here).
  private val multimodalMetaSql =
    """SELECT CASE CAST(doc_id % 3 + 1 AS INT) WHEN 1 THEN 'image'
                   WHEN 2 THEN 'audio' ELSE 'video' END AS kind,
              source AS meta_source, count(*) AS n,
              CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
              CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
              CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
       FROM documents GROUP BY 1, 2"""

  // sketch surfaces for the 100-TB path: HLL distinct + approximate
  // quantiles. Declared WITHOUT oracle SQL (algorithm-specific estimates
  // cannot hash-match a different engine) → driver records the weaker
  // rows-only check, as the contract allows.
  private val approxStats: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"),
        count(lit(1)).as("n_rows"))

  // Own mergeable t-digest (functions/QuantileSketch) beside Spark's
  // builtin sketches above: O(δ) state per group however large the
  // group, merged by Spark's partial aggregation. Estimates depend on
  // merge order → rows-only like a_approx_sketches; QuantileSketchSpec
  // pins rank error against ExactQuantile ground truth instead.
  private val tdigestQuantiles: Q = (s, d) => {
    val sk = udaf(new QuantileSketchAgg(100))
    val est = udf((r: Row, q: Double) => QuantileSketch.quantileOf(
      TDigestState(r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray,
        r.getInt(2), r.getLong(3), r.getDouble(4), r.getDouble(5)), q))
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("x"))
      .groupBy("l_returnflag")
      .agg(sk(col("x")).as("dig"), count(lit(1)).as("n_rows"))
      .select(col("l_returnflag") +: col("n_rows") +:
        qs.map(q => est(col("dig"), lit(q)).as(s"q${(q * 100).toInt}")): _*)
  }

  // frame sampling over video payloads: up to 4 evenly-strided byte
  // offsets per payload, each yielding an 8-byte "frame header" slice
  // (hex view of the opaque binary — the slice a real demuxer would seek
  // to). A pure per-row generate+project: no shuffle, embarrassingly
  // parallel, and the byte math is identical in both engines because it
  // runs on the hex string of the UTF-8 payload bytes.
  private val frameSample: Q = (s, d) => {
    val v = Tables.documents(s, d).filter(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("media_id"),
        hex(encode(col("text"), "UTF-8")).as("hx"),
        length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"))
    v.withColumn("stride", greatest(lit(1L), (col("byte_len") / 4).cast("long")))
      .withColumn("frame_idx", explode(sequence(lit(0L), lit(3L))))
      .filter(col("frame_idx") * col("stride") < col("byte_len"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * col("stride")).as("offset_bytes"),
        expr("substr(hx, CAST(frame_idx * stride * 2 + 1 AS INT), 16)").as("hdr_hex"),
        col("byte_len"))
  }

  private val frameSampleSql =
    """WITH v AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
                  FROM documents WHERE doc_id % 3 = 2),
        f AS (SELECT media_id, hx, byte_len,
                     greatest(1, byte_len // 4) AS stride,
                     unnest(range(4)) AS frame_idx
              FROM v)
        SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(frame_idx * stride AS BIGINT) AS offset_bytes,
               substr(hx, frame_idx * stride * 2 + 1, 16) AS hdr_hex,
               byte_len
        FROM f WHERE frame_idx * stride < byte_len"""

  // GeoTIFF byte-boundary round trip (SURVEY §2.1 ingest utility; the
  // reference's rioxarray load, differencing_functions.py:69–79): raster B
  // → dense strips → ENCODE to real GeoTIFF bytes inside an executor
  // (per-tile assembly, tile-bounded memory) → DECODE tile-parallel →
  // pixel table. The oracle is the ORIGINAL grid SQL, so the row is green
  // only if bytes→pixels→bytes is bit-lossless. The 128×128 fixture is
  // one tile; at 100 TB each tile is one bounded group of this same shape.
  private val geotiffRoundtrip: Q = (s, d) => {
    import s.implicits._
    val meta = graft.raster.GridMeta()
    val dense = graft.ingest.DenseRaster.toDense(
      graft.raster.PixelGrid.grid(s, d, 1), meta)
    val tiles = dense.select(col("row"), col("values"))
      .as[(Int, Seq[Double])]
      .groupByKey(_ => 0)
      .mapGroups { (id: Int, it: Iterator[(Int, Seq[Double])]) =>
        val rows = it.toArray.sortBy(_._1).map(_._2.toArray)
        (id, graft.ingest.GeoTiff.encode(meta, rows))
      }
      .toDF("tile_id", "data")
    graft.ingest.GeoTiff.tilesToPixels(tiles)
      .select(col("col"), col("row"), col("value"))
  }

  private val geotiffRoundtripSql =
    s"""WITH g AS (${graft.raster.PixelGrid.gridSql(1)})
        SELECT col, "row", value FROM g"""

  // LAS byte-boundary round trip (the reference's PDAL read,
  // differencing_functions.py:738–828): synthetic points → LAS 1.2
  // format-0 bytes assembled in an executor → decoded tile-parallel →
  // DEM gridding. LAS stores coordinates as scaled int32, so the oracle
  // applies the identical quantization (floor(v/scale + 0.5) * scale —
  // deterministic IEEE ops) to the raw points before gridding: the row is
  // green only if the byte codec is exactly that quantization and nothing
  // else.
  private val lasRoundtrip: Q = (s, d) => {
    import s.implicits._
    val tiles = PointCloud.points(s, d)
      .select(col("x"), col("y"), col("z"), col("classification"))
      .as[(Double, Double, Double, Int)]
      .groupByKey(_ => 0)
      .mapGroups { (id: Int, it: Iterator[(Double, Double, Double, Int)]) =>
        (id, graft.ingest.Las.encode(it.toArray))
      }
      .toDF("tile_id", "data")
    PointCloud.gridDem(graft.ingest.Las.tilesToPoints(tiles))
  }

  private val lasRoundtripSql = PointCloud.gridDemSql(
    s"""SELECT floor(x / 0.000001 + 0.5) * 0.000001 AS x,
               floor(y / 0.000001 + 0.5) * 0.000001 AS y,
               floor(z / 0.000001 + 0.5) * 0.000001 AS z,
               classification
        FROM (${PointCloud.pointsSql})""")

  val queries: Map[String, Q] = Map(
    "i_pointcloud_grid" -> pointcloudGrid,
    "i_multimodal_meta" -> multimodalMeta,
    "i_frame_sample" -> frameSample,
    "i_geotiff_roundtrip" -> geotiffRoundtrip,
    "i_las_roundtrip" -> lasRoundtrip,
    "a_count_distinct" -> countDistinctQ,
    "a_approx_sketches" -> approxStats,
    "a_tdigest_quantiles" -> tdigestQuantiles,
  )

  val oracle: Map[String, String] = Map(
    "i_pointcloud_grid" -> pointcloudGridSql,
    "i_multimodal_meta" -> multimodalMetaSql,
    "i_frame_sample" -> frameSampleSql,
    "i_geotiff_roundtrip" -> geotiffRoundtripSql,
    "i_las_roundtrip" -> lasRoundtripSql,
    "a_count_distinct" -> countDistinctSql,
  )
}
