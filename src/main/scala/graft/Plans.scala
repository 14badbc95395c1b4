package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: formatted physical plans for the headline queries —
  * the evidence trail for ARCHITECTURE.md's shuffle/pushdown claims.
  * `runMain graft.Plans [sfDir]`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = Seq(
      "s_filter_project" -> "predicate pushdown + column pruning into the parquet scan",
      "r_diff_join" -> "grid-aligned equi-join differencing",
      "v_variogram" -> "bucketed band self-join → partial-agg Matheron bins (no cartesian product)",
      "x_dedup_minhash_lsh" -> "banded LSH self-join on (band_id, band_val)",
      "t_slope" -> "one-shuffle 3×3 stencil (explode-to-neighbors + pivot agg)",
      "n_cosine_topk" -> "broadcast query batch × candidates, rank over rounded sims",
      "x_repetition" -> "shuffle-free in-row text metrics (zero exchanges)",
      "q_sql_exists" -> "correlated EXISTS/NOT EXISTS decorrelated to semi/anti hash joins",
      "m_auc" -> "Mann-Whitney AUC: windows over (slice, score) groups, never raw rows",
      "g_pagerank" -> "edge-partitioned power iteration: per-step rank⋈edges + groupBy-sum on dst",
      "x_bm25_topk" -> "broadcast corpus stats; TakeOrdered top-k before any global window",
      "o_interval_union" -> "gaps-and-islands sweep as per-user windows (no global sort)",
      "x_pipeline_keep" -> "one window shuffle (prefix-dup groups) + pure projection rule chain",
      "a_stats11" -> "zone windows + ONE-row ALL side from hash agg + radix selection (no whole-table window partition)",
      "t_gapfill_2d" -> "halo-tile kernel: one shuffle on tile keys, per-tile imperative radius search",
      "x_pack_chunks" -> "per-shard integer cumsum windows (lang partitions — no global window)",
      "r_utm_project" -> "Krüger UTM forward+inverse as one codegen projection (no UDF, no shuffle)",
      "x_decontaminate" -> "eval grams broadcast; train side dedupes in-row (array_distinct) — no corpus-wide gram shuffle",
      "x_domain_cap" -> "per-source budget cap: grouped top-k (WindowGroupLimit rank pushdown, no global sort)",
      "x_lsh_recall" -> "prefix-filtered exact truth: df-ordered in-row prefix cut, self-join on prefixes only, length-filtered two-pointer kernel verify (MultisetIntersectSize over pre-sorted arrays) on candidates",
      "n_sq8_topk" -> "SQ8 ANN: broadcast 1-row quantizer stats, integer-dot code scan, exact rescore of top-10 only",
      "x_dsir_weights" -> "DSIR: vocab-level md5 buckets, B-row log-ratio broadcast onto per-doc word counts",
      "a_hll_est" -> "HLL registers: hash-agg to ≤sources×64 register rows, integer harmonic sums",
      "x_bloom_decon" -> "bloom probe: two broadcast equi-joins on filter-word index, exact join kept beside it",
      "w_hampel" -> "rolling median ± 3·MAD: bounded ±5-row frame, map-side array math, one window shuffle",
      "o_asof_nearest" -> "nearest as-of: ONE union shuffle, backward+forward windows over a shared sort",
      "a_approx_sketches" -> "exactly-gated sketches: HLL register hash-agg + integer histogram median, both merge-order-free",
      "a_tdigest_quantiles" -> "canonical t-digest: domain-bounded cumulative window over distinct cents, boundary-literal clustering, integer centroid agg",
      "i_smrf_reclassify" -> "SMRF morphology: cell min-surface → offset-explode erode/dilate → point classify join",
      "r_geoid_offset" -> "geoid offset: coarse undulation grid broadcast onto the pixel table (zero raster shuffle)",
      "i_smrf_multiwindow" -> "windowed SMRF: checkpointed radius-k openings, single-consumption offset-explode stages, object-mask anti-filter",
      "i_laz_roundtrip" -> "LAZ codec boundary: executor-side arithmetic-coded chunk encode → chunk-parallel decode → DEM gridding",
      "g_pagerank6" -> "pre-partitioned contrib table (deg fused, hash(src) from cache): per iteration one rank join + one dst shuffle",
      "o_zorder_curve" -> "Morton interleave as pure shift/and/or codegen columns (no UDF, no shuffle)",
      "i_tiff_dsv2" -> "GeoTIFF DSv2 connector: write-stage one f64 tile per task, read back via header-pruned per-file partitions",
      "i_tiff_mosaic_lzw" -> "LZW z-ordered mosaic: one-open-tile sorted connector write (Morton-clustered), header-pruned bbox read decodes 4/16 tiles",
      "i_geotiff_overviews" -> "overview pyramid: multi-IFD mean-downsample chain per tile, connector level-k read decodes only the coarse page",
      "r_geoid_resample" -> "dual-geoid bilinear resample: 8 chained broadcast corner joins, fixed-order interpolation — zero exchanges",
      "x_ccnet_buckets" -> "CCNet terciles: per-lang thresholds from 4-scan grouped radix (no PARTITION BY lang funnel), bucket assignment via broadcast threshold join",
      "x_semdedup" -> "SemDeDup: cluster-scoped pair join (never O(N²) global), dominance semi-mark, one census aggregate",
      "g_labelprop" -> "label propagation: per round one rank join + (dst,lbl) count + per-dst window pick — one shuffle chain per superstep",
      "x_split_assign" -> "hash split: map-side md5 bucket, single aggregate, zero joins",
      "i_shp_roundtrip" -> "shapefile codec boundary: executor-side per-tile encode → tile-parallel decode → per-record census",
      "i_geojson_parse" -> "GeoJSON boundary: in-row Feature assembly → schema-directed from_json → in-row array folds (zero extra shuffles)",
      "i_gpkg_roundtrip" -> "GeoPackage boundary: per-tile SQLite b-tree encode → GPB/WKB vertex fan-out → per-feature census",
      "g_wkb_roundtrip" -> "WKB geometry column: in-row encode/decode of binary geometry (the GeoParquet shape), one census aggregate",
      "x_url_canon" -> "URL canonicalization: pure map-side regex chain + one canonical-key aggregate (no joins)",
      "q_sql_recursive" -> "recursive CTE: UnionLoop body joins ONE cached edge relation per level (broadcast frontier, edges materialized outside the loop — r8)",
      "i_gtx_roundtrip" -> "GTX geoid boundary: per-tile .gtx assembly + decode in executors, header-derived node checksum",
      "i_las14_roundtrip" -> "LAS 1.4 fmt-6 boundary: executor-side container encode → tile-parallel decode, every channel censused",
      "i_mjpeg_frames" -> "MJPEG AVI: container walk yields per-frame JPEG payloads, each independently decoded map-side",
      "r_gtx_geoid" -> "geoid offset through real .gtx bytes: one-task grid assembly, broadcast onto the pixel table",
      "i_las_dsv2" -> "DataSource V2 connector: one InputPartition per .las file, pruned ReadSchema, per-file version dispatch",
      "r_helmert_datum" -> "7-param Helmert datum chain as one codegen projection (no UDF, no shuffle); oracle = pinned longdouble artifact",
      "r_gridshift_datum" -> "PROJ-style grid-shift: two GTX shift grids broadcast, 8 corner joins, fixed-order bilinear — zero raster shuffle",
      "a_pivot_wide" -> "explicit-value-list pivot: one hash aggregate, map-side column widening (no inferred-list distinct scan)",
      "g_knn_triangles" -> "kNN-graph triangles: IVF-bucketed candidate equi-join → top-k window → 3-way join on ≤k·n canonical edges",
      "x_bpe_merges" -> "BPE merges: one corpus wordcount shuffle, then vocab-sized pair aggregates; winner broadcast into the next merge",
      "n_pca_power" -> "PCA power step: D² quantized-product explode → one hash aggregate; all matrix work on 4096 rows",
      "m_bleu" -> "BLEU-2: corpus-sized gram explode + broadcast reference clip join, no pair space",
      "i_csv_parse" -> "CSV boundary: map-side to_csv → from_csv round trip, single final aggregate",
      "i_jpeg_decode" -> "JPEG deep codec: per-row executor-side encode+decode (map-side, embarrassingly parallel), one census aggregate",
      "i_orc_roundtrip" -> "ORC boundary: partition-parallel rewrite then vectorized ORC scan into one hash aggregate",
      "i_xml_parse" -> "XML boundary: map-side to_xml → from_xml round trip through entity escaping, single aggregate",
      "x_bpe_apply" -> "BPE apply: corpus (source,word) count once; merges trained vocab-sized then broadcast as two scalar pairs",
      "g_assortativity" -> "degree assortativity: two node-sized degree joins + one 6-sum integer aggregate, closed-form Pearson",
      "g_kcore" -> "k-core peel: per round one degree agg + two broadcast anti-joins on the cached peel delta (zero edge shuffle)",
      "t_flow_accum" -> "D8 flow accumulation: cell-sized edge table cached, per hop one equi-join + integer hash agg",
      "i_bigtiff_roundtrip" -> "BigTIFF boundary: u64-offset tiles assembled per executor, tile-parallel decode",
      "i_npy_roundtrip" -> "NPY matrix boundary: per-tile .npy assembly + decode in executors, quantized element checksum",
      "m_psi" -> "PSI drift: integer bin counts, per-bin terms quantized before the 10-row sum",
      "v_jackknife" -> "delete-group jackknife: one corpus agg to K rows, exact integer devq reduction",
      "a_zscore_outliers" -> "z-score census: integer-dollar moments, broadcast stats join back, no window",
      "i_tiff_lod" -> "resolution-aware LOD read: per-file coarsest-satisfying overview level from header-only IFD walks, unioned level census",
      "r_dhdt_trend" -> "per-pixel OLS dh/dt: six aggregates in ONE pixel-key shuffle with map-side partials — no time window, no per-pixel collect",
      "r_dhdt_wls" -> "weighted dh/dt: the same one-shuffle normal equations with Σw playing n (exact k/16 weights)",
      "r_stack_median" -> "temporal composite: exact interpolated median over epoch-bounded (≤5-row) pixel groups",
      "r_coreg_nuthkaab" -> "Nuth–Kääb co-registration: Horn-gradient basis, nine power sums in one aggregation, 3×3 Cramer on the 1-row result",
      "r_hypso_bands" -> "hypsometric bands: one equi-join + one band groupBy, exact k/1024 sums",
      "r_hypso_fill" -> "hypsometric void fill: broadcast band-mean table joined back — never a window over the pixel table",
      "r_coreg_aspect_diag" -> "Nuth–Kääb diagnostic: flat-masked dh/tan(slope) by aspect bin — one groupBy, quantized ratios")
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans of headline queries\n\n"
    sb ++= s"Generated by `runMain graft.Plans` on `$dir`. Evidence for the\n"
    sb ++= "shuffle/pushdown/codegen claims in ARCHITECTURE.md.\n"
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      // literals can carry control chars (e.g. a NUL sentinel) — escape
      // them so the markdown stays a text file
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .flatMap(c => if (c < ' ' && c != '\n') f"\\u${c.toInt}%04x" else c.toString)
      // iterative queries with per-stage caches repeat each stage's whole
      // child tree inside every InMemoryRelation — 600+ kB of text for
      // one plan; the head carries all the shuffle/pushdown evidence
      val plan =
        if (full.length <= 60000) full
        else full.take(60000) +
          s"\n… [truncated: ${full.length} chars — cached iterative stages repeat their child trees]\n"
      sb ++= s"\n## $name — $why\n\n```\n$plan```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
