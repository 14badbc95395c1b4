package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.Tables
import graft.rng.Rand
import graft.zonal.Zonal

/** Scalar transforms, filters, dates, sorts, set ops, and aggregations
  * (SURVEY.md §2.2, §2.4, §2.6, §2.8, §2.9), declared over the driver
  * corpus with lockstep DuckDB oracle SQL.
  */
object QueriesCore {
  type Q = (SparkSession, String) => DataFrame

  // §2.2 classification range filter (LAS class keep/drop semantics,
  // differencing_functions.py:794–806) mapped onto the events table.
  private val filterProject: Q = (s, d) =>
    Tables.events(s, d)
      .filter(!col("event_type").isin("error", "signup") && col("value") > 50.0)
      .select(col("event_id"), col("event_type"), round(col("value"), 6).as("value"))

  private val filterProjectSql =
    """SELECT event_id, event_type, round(value, 6) AS value
       FROM events
       WHERE event_type NOT IN ('error', 'signup') AND value > 50.0"""

  // §2.2 assign/overwrite column (filters.assign, :802–803)
  private val assignOverwrite: Q = (s, d) =>
    Tables.documents(s, d).filter(col("source") === "src1")
      .select(col("doc_id"), lit(0).as("classification"), col("lang"))

  private val assignOverwriteSql =
    """SELECT doc_id, 0 AS classification, lang FROM documents WHERE source = 'src1'"""

  // §2.2 percentile clip filter: two-phase [p1, p99] keep
  // (variography_uncertainty.py:253–260)
  private val percentileClip: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    // radix-selection quantiles: exactly 4 histogram scans, aggregation-
    // only — no TakeOrdered retaining k≈p·n rows per partition and no
    // sequential probe jobs (see ExactQuantile.nthsByRadix, the 100-TB
    // clip-quantile path)
    val qs = graft.functions.ExactQuantile.quantilesByRadix(
      li, "l_extendedprice", Seq(0.01, 0.99))
    val (lo, hi) = (qs(0.01), qs(0.99))
    // mean over an sf-growing clipped group: 1e-6-quantized decimal sum,
    // one divide (float-mean audit; price magnitudes need > LONG range)
    li.filter(col("l_extendedprice").between(lit(lo), lit(hi)))
      .agg(count(lit(1)).as("n"),
        round(sum(floor(col("l_extendedprice") * 1e6 + 0.5)
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("double") /
          (count(lit(1)).cast("double") * 1e6), 6).as("mean_price"),
        round(min("l_extendedprice"), 6).as("min_price"),
        round(max("l_extendedprice"), 6).as("max_price"))
  }

  private val percentileClipSql =
    """WITH b AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
                         quantile_cont(l_extendedprice, 0.99) AS hi FROM lineitem)
       SELECT count(*) AS n,
              round(CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
                    / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_price,
              round(min(l_extendedprice), 6) AS min_price,
              round(max(l_extendedprice), 6) AS max_price
       FROM lineitem, b WHERE l_extendedprice BETWEEN lo AND hi"""

  // §2.2 symmetric color bounds (`_sym_range`, differencing_functions.py:2432–2452)
  private val symRange: Q = (s, d) =>
    Tables.events(s, d)
      .agg(max(abs(col("value"))).as("m"))
      .select(round(negate(col("m")), 6).as("lo"), round(col("m"), 6).as("hi"))

  private val symRangeSql =
    """SELECT round(-max(abs(value)), 6) AS lo, round(max(abs(value)), 6) AS hi FROM events"""

  // §2.2 name sanitization (`_clean`, differencing_functions.py:401–404)
  private val nameSanitize: Q = (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey"),
        regexp_replace(col("c_name"), "[^\\w]+", "_").as("clean_name"))

  private val nameSanitizeSql =
    """SELECT c_custkey, regexp_replace(c_name, '[^\w]+', '_', 'g') AS clean_name
       FROM customer WHERE c_custkey % 97 = 0"""

  // §2.2 data-source classifier (substring dispatch,
  // differencing_functions.py:491–492)
  private val sourceClassifier: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(lower(col("source")).contains("1"), "usgs")
          .when(lower(col("source")).contains("2"), "noaa")
          .otherwise("ot").as("provider"))

  private val sourceClassifierSql =
    """SELECT doc_id,
              CASE WHEN contains(lower(source), '1') THEN 'usgs'
                   WHEN contains(lower(source), '2') THEN 'noaa'
                   ELSE 'ot' END AS provider
       FROM documents"""

  // §2.2 temporal-coverage parser: "start / end" string round-trip
  // (differencing_functions.py:467–485)
  private val temporalParse: Q = (s, d) => {
    val spans = Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(min(to_date(col("o_orderdate"))).as("d0"),
           max(to_date(col("o_orderdate"))).as("d1"))
      .select(col("o_orderpriority"),
        concat(col("d0").cast("string"), lit(" / "), col("d1").cast("string")).as("coverage"))
    spans.select(col("o_orderpriority"), col("coverage"),
      to_date(element_at(split(col("coverage"), " / "), 1)).as("start_date"),
      to_date(element_at(split(col("coverage"), " / "), 2)).as("end_date"))
  }

  private val temporalParseSql =
    """WITH spans AS (
         SELECT o_orderpriority,
                CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) || ' / ' ||
                CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS coverage
         FROM orders GROUP BY 1)
       SELECT o_orderpriority, coverage,
              CAST(string_split(coverage, ' / ')[1] AS DATE) AS start_date,
              CAST(string_split(coverage, ' / ')[2] AS DATE) AS end_date
       FROM spans"""

  // §2.2 midpoint epoch: start + (end−start)/2
  // (differencing_functions.py:554–566)
  private val midpointEpoch: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy((col("o_custkey") % 101).as("cohort"))
      .agg(min(to_date(col("o_orderdate"))).as("d0"),
           max(to_date(col("o_orderdate"))).as("d1"))
      .select(col("cohort"), col("d0"), col("d1"),
        date_add(col("d0"), (datediff(col("d1"), col("d0")) / 2).cast("int")).as("midpoint"))

  private val midpointEpochSql =
    """SELECT o_custkey % 101 AS cohort,
              min(CAST(o_orderdate AS DATE)) AS d0,
              max(CAST(o_orderdate AS DATE)) AS d1,
              min(CAST(o_orderdate AS DATE)) +
                CAST(datediff('day', min(CAST(o_orderdate AS DATE)),
                                     max(CAST(o_orderdate AS DATE))) // 2 AS INT) AS midpoint
       FROM orders GROUP BY 1"""

  // §2.2 decimal-year epoch (differencing_functions.py:1331, 1922)
  private val decimalYear: Q = (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") % 211 === 0)
      .select(col("o_orderkey"),
        round(year(col("o_orderdate")) +
          (dayofyear(col("o_orderdate")) - 1) / lit(365.25), 6).as("decimal_year"))

  private val decimalYearSql =
    """SELECT o_orderkey,
              round(year(o_orderdate) + (dayofyear(o_orderdate) - 1) / 365.25, 6) AS decimal_year
       FROM orders WHERE o_orderkey % 211 = 0"""

  // Business-day lead time (order → ship, weekends excluded) — the SLA
  // arithmetic every operations dashboard runs. Closed form, no calendar
  // table: with e = epoch-day and f(e) = 5·((e+3) div 7) +
  // least((e+3) mod 7, 5) − 3 counting weekdays in [1970-01-01, e),
  // business days = f(e_ship) − f(e_order). Pure integer math on the
  // same epoch-day values in both engines (timestamps cast to DATE under
  // the shared UTC session), so the census is exact. One equi-join +
  // one hash aggregate.
  private val businessDays: Q = (s, d) => {
    // epoch days are non-negative here, so truncation == floor division
    def f(e: Column): Column =
      lit(5) * floor((e + 3) / 7).cast("long") +
        least((e + 3) % 7, lit(5)) - 3
    val j = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01")).as("e1"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01")).as("e2")),
        col("o_orderkey") === col("l_orderkey"))
    j.select(col("o_orderpriority"),
        (f(col("e2")).cast("long") - f(col("e1")).cast("long")).as("bd"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("bd").as("bd_sum"),
        max("bd").as("bd_max"), min("bd").as("bd_min"))
  }

  private val businessDaysSql = {
    def f(e: String) = s"(5 * (($e + 3) // 7) + least(($e + 3) % 7, 5) - 3)"
    s"""WITH j AS (SELECT o.o_orderpriority,
                          datediff('day', DATE '1970-01-01',
                                   CAST(o.o_orderdate AS DATE)) AS e1,
                          datediff('day', DATE '1970-01-01',
                                   CAST(l.l_shipdate AS DATE)) AS e2
                   FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(${f("e2")} - ${f("e1")}) AS BIGINT) AS bd_sum,
               CAST(max(${f("e2")} - ${f("e1")}) AS BIGINT) AS bd_max,
               CAST(min(${f("e2")} - ${f("e1")}) AS BIGINT) AS bd_min
        FROM j GROUP BY 1"""
  }

  // §2.2 GPS-seconds → date, with the LAS-1.4 +1e9 adjustment
  // (differencing_functions.py:1559–1567, 1889–1893)
  private val gpsEpoch: Q = (s, d) => {
    val gps = Rand.mix(col("o_orderkey"), 11).cast("double")
    val adj = when(gps < 1e9, gps + 1e9).otherwise(gps)
    Tables.orders(s, d).filter(col("o_orderkey") % 307 === 0)
      .select(col("o_orderkey"), gps.as("gps_seconds"),
        date_add(to_date(lit("1980-01-06")), floor(adj / 86400.0).cast("int")).as("acq_date"))
  }

  private val gpsEpochSql = {
    val gps = s"CAST(${Rand.mixSql("o_orderkey", 11)} AS DOUBLE)"
    s"""SELECT o_orderkey, $gps AS gps_seconds,
          DATE '1980-01-06' + CAST(floor(
            (CASE WHEN $gps < 1e9 THEN $gps + 1e9 ELSE $gps END) / 86400.0) AS INT) AS acq_date
        FROM orders WHERE o_orderkey % 307 = 0"""
  }

  // §2.9 JSON extraction (catalog flattening analog,
  // differencing_functions.py:463–504) over events.props
  private val jsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        // schema-directed from_json (vectorized parse) rather than
        // per-row get_json_object path evaluation
        expr("from_json(props, 'k INT').k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("k"), 6).as("mean_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  private val jsonExtractSql =
    """SELECT event_type, count(*) AS n,
              round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS mean_k,
              min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
              max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
       FROM events GROUP BY 1"""

  // §2.6 catalog sort by date + head (differencing_functions.py:506–508)
  private val sortLimit: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_orderdate"), round(col("o_totalprice"), 6).as("price"))

  private val sortLimitSql =
    """SELECT o_orderkey, o_orderdate, round(o_totalprice, 6) AS price
       FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 100"""

  // §2.6 / SURVEY §4: Z-order (Morton) locality key — the write-order
  // key behind Layout.saveZOrdered (file extents become compact 2-D
  // squares so bbox predicates prune parquet min-max stats on BOTH
  // axes). Gated here as pure integer bit arithmetic: the engine runs
  // the codegen column chain (Layout.zOrder), the oracle the identical
  // shift/and/or rounds in SQL — exact by construction. Keys span past
  // 2^16 so every spread round's mask is exercised.
  private val zorderCurve: Q = (s, d) => {
    val zc = col("c_custkey") % 100000
    val zr = (col("c_custkey") * 2654435761L) % 100000
    Tables.customer(s, d)
      .select(col("c_custkey"), zc.cast("long").as("zc"),
        zr.cast("long").as("zr"),
        graft.raster.Layout.zOrder(zc, zr).as("zkey"))
  }

  /** One bit-spread round-chain as SQL text (DuckDB runs the same
    * integer ops; text expands to 32 copies of the base — fine). */
  private def spreadSql(e: String): String = {
    var x = s"(CAST($e AS BIGINT) & 4294967295)"
    for ((sh, m) <- Seq((16, "281470681808895"), (8, "71777214294589695"),
        (4, "1085102592571150095"), (2, "3689348814741910323"),
        (1, "6148914691236517205")))
      x = s"((($x) | (($x) << $sh)) & $m)"
    x
  }
  private val zorderCurveSql = {
    val zc = "(c_custkey % 100000)"
    val zr = "((c_custkey * 2654435761) % 100000)"
    s"""SELECT c_custkey, CAST($zc AS BIGINT) AS zc,
               CAST($zr AS BIGINT) AS zr,
               (${spreadSql(zc)} | (${spreadSql(zr)} << 1)) AS zkey
        FROM customer"""
  }

  // §2.6 pick-by-index (`pick`, differencing_functions.py:516–574).
  // The largest requested index is a CONSTANT (1000), so take the global
  // top-1000 first (TakeOrderedAndProject: per-partition top-k, driver
  // merges k rows) and rank only those — the unpartitioned window then
  // runs on ≤1000 rows instead of the whole table.
  private val pickIndex: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .limit(1000)
      .withColumn("idx", row_number().over(
        Window.orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long"))
      .filter(col("idx").isin(1, 500, 1000))
      .select(col("idx"), col("o_orderkey"), col("o_orderstatus"))

  private val pickIndexSql =
    """SELECT idx, o_orderkey, o_orderstatus FROM (
         SELECT o_orderkey, o_orderstatus,
                row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS idx
         FROM orders) WHERE idx IN (1, 500, 1000)"""

  // §2.6 argmin top-1 selection (AIC argmin analog,
  // variography_uncertainty.py:835–844)
  private val argminSelect: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))))
      .filter(col("rn") === 1)
      .select(col("c_mktsegment"), col("c_custkey"), round(col("c_acctbal"), 6).as("acctbal"))

  private val argminSelectSql =
    """SELECT c_mktsegment, c_custkey, round(c_acctbal, 6) AS acctbal
       FROM customer
       QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) = 1"""

  // §2.8 set difference / intersection / union over partkey sets
  // (stable−unstable EXCEPT, overlap INTERSECT, unary_union;
  // stable_unstable_areas.py:351–410, differencing_functions.py:2024–2047)
  //
  // r14 optimization: each set op used to scan lineitem TWICE (one
  // filtered distinct per side) and run 2–3 exchanges (per-side
  // distincts + the anti/semi join). The two sides partition the same
  // table by suppkey parity, so one scan with a per-key membership
  // aggregate — max(parity=0), max(parity=1) — yields the identical
  // sets from HALF the scan volume and a SINGLE exchange: EXCEPT is
  // has0 ∧ ¬has1, INTERSECT is has0 ∧ has1, UNION is has0 ∨ has1.
  // Null semantics match the originals: a null suppkey makes both
  // flags null for that row (max ignores nulls — such rows joined
  // neither side before), and a null partkey still forms its own
  // group exactly like EXCEPT/INTERSECT's null-safe key equality.
  private def sideFlags(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_partkey"), (col("l_suppkey") % 2 === 0).as("even"))
      .groupBy("l_partkey")
      .agg(coalesce(max(col("even")), lit(false)).as("has0"),
        coalesce(max(!col("even")), lit(false)).as("has1"))

  private val setExcept: Q = (s, d) =>
    sideFlags(s, d).filter(col("has0") && !col("has1")).select("l_partkey")
  private val setExceptSql =
    """SELECT DISTINCT l_partkey FROM lineitem WHERE l_suppkey % 2 = 0
       EXCEPT
       SELECT DISTINCT l_partkey FROM lineitem WHERE l_suppkey % 2 = 1"""

  private val setIntersect: Q = (s, d) =>
    sideFlags(s, d).filter(col("has0") && col("has1")).select("l_partkey")
  private val setIntersectSql =
    """SELECT DISTINCT l_partkey FROM lineitem WHERE l_suppkey % 2 = 0
       INTERSECT
       SELECT DISTINCT l_partkey FROM lineitem WHERE l_suppkey % 2 = 1"""

  private val setUnion: Q = (s, d) =>
    sideFlags(s, d).filter(col("has0") || col("has1")).select("l_partkey")
  private val setUnionSql =
    """SELECT l_partkey FROM lineitem WHERE l_suppkey % 2 = 0
       UNION
       SELECT l_partkey FROM lineitem WHERE l_suppkey % 2 = 1"""

  // §2.4 group-by aggregation (zonal-stats shape on the corpus)
  // group sizes grow with sf → 1e-6-quantized DECIMAL(38,0)/HUGEINT sums,
  // one divide (float-mean audit: raw double sums are merge-order-
  // dependent; prices ~1e5 × sf1 group sizes put quantized sums past a
  // LONG, so the decimal form of the house convention applies)
  private val groupAgg: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    def q6(c: Column): Column = floor(c * 1e6 + 0.5).cast(DecimalType(38, 0))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum(q6(col("l_quantity"))).cast("double") / 1e6, 6).as("sum_qty"),
        round(sum(q6(col("l_extendedprice"))).cast("double") /
          (count(lit(1)).cast("double") * 1e6), 6).as("avg_price"),
        round(sum(q6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double") / 1e6, 2).as("revenue"),
        count(lit(1)).as("n"))
  }

  private val groupAggSql =
    """SELECT l_returnflag, l_linestatus,
              round(CAST(sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 1000000.0, 6) AS sum_qty,
              round(CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
                    / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS avg_price,
              round(CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE) / 1000000.0, 2) AS revenue,
              count(*) AS n
       FROM lineitem GROUP BY 1, 2"""

  // §2.4 11-stat descriptive summary + mode, per zone + ALL rollup
  // (stable_unstable_areas.py:549–584, 641–671)
  private val stats11: Q = (s, d) =>
    Zonal.statsWithMode(() => Tables.lineitem(s, d)
      .select(col("l_returnflag").as("name"),
        (col("l_extendedprice") / 1000.0).as("v")), share = false)

  private val stats11Sql = Zonal.statsSql(
    "SELECT l_returnflag AS name, l_extendedprice / 1000.0 AS v FROM lineitem")

  // §2.4 RMS + uncorrelated term rms/√n
  // (variography_uncertainty.py:1548–1552, compute_rms_from_tif :1739–1764)
  // group grows with sf → integer-exact mean square (1e-6-quantized long
  // sum, one divide — float-mean audit)
  private val rmsUncorrelated: Q = (s, d) =>
    Tables.events(s, d).filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        sqrt(sum(floor(col("value") * col("value") * 1e6 + 0.5).cast("long"))
          .cast("double") / (count(lit(1)).cast("double") * 1e6)).as("rms"))
      .select(col("n"), round(col("rms"), 6).as("rms"),
        round(col("rms") / sqrt(col("n")), 6).as("uncorrelated"))

  private val rmsUncorrelatedSql =
    """SELECT n, round(rms, 6) AS rms, round(rms / sqrt(n), 6) AS uncorrelated
       FROM (SELECT count(*) AS n,
                    sqrt(CAST(sum(CAST(floor(value * value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                         / (CAST(count(*) AS DOUBLE) * 1000000.0)) AS rms
             FROM events WHERE event_type = 'purchase')"""

  // §2.9 WKT assembly (_coords_to_wkt, differencing_functions.py:249–266)
  // + §2.8 polygon explode: one synthetic polygon vertex per nation
  // (coords from the counter RNG), assembled per region into WKT with a
  // deterministic vertex order, then exploded back to parts
  private val wktAssembly: Q = (s, d) => {
    val verts = Tables.nation(s, d).select(
      col("n_regionkey").as("region"), col("n_nationkey").as("k"),
      concat((Rand.mix(col("n_nationkey"), 71) % 100).cast("string"), lit(" "),
        (Rand.mix(col("n_nationkey"), 72) % 100).cast("string")).as("pt"))
    verts.groupBy("region")
      .agg(collect_list(struct(col("k"), col("pt"))).as("parts"))
      .select(col("region"),
        concat(lit("POLYGON (("),
          array_join(transform(array_sort(col("parts")), p => p.getField("pt")), ", "),
          lit("))")).as("wkt"),
        size(col("parts")).cast("long").as("n_vertices"))
  }
  private val wktAssemblySql = {
    val x = s"CAST((${Rand.mixSql("n_nationkey", 71)}) % 100 AS VARCHAR)"
    val y = s"CAST((${Rand.mixSql("n_nationkey", 72)}) % 100 AS VARCHAR)"
    s"""SELECT n_regionkey AS region,
          'POLYGON ((' || string_agg($x || ' ' || $y, ', ' ORDER BY n_nationkey) || '))' AS wkt,
          count(*) AS n_vertices
        FROM nation GROUP BY 1"""
  }

  // §2.8 polygon explode: multipolygon parts → rows
  // (explode(index_parts=False), stable_unstable_areas.py:305)
  private val polyExplode: Q = (s, d) =>
    Tables.nation(s, d).select(col("n_nationkey"),
        // sequence over long endpoints: element (and thus part_idx) is
        // BIGINT to match the oracle's unnest(range(...))
        explode(sequence(lit(0L), (col("n_nationkey") % 3).cast("long")))
          .as("part_idx"))
      .select(col("n_nationkey"), col("part_idx"),
        round((col("n_nationkey") + 1) * (col("part_idx") + 1) * 1.5, 6).as("part_area"))
  private val polyExplodeSql =
    """SELECT n_nationkey, part_idx,
              round((n_nationkey + 1) * (part_idx + 1) * 1.5, 6) AS part_area
       FROM (SELECT n_nationkey, unnest(range(n_nationkey % 3 + 1)) AS part_idx
             FROM nation)"""

  // §2.5 analytic window with a running frame (engine surface beyond the
  // reference, which has no ordered-relation windows): cumulative revenue
  // per supplier in ship order. The frame accumulates in a defined total
  // order (date, orderkey, linenumber unique), so the running double sum
  // is evaluation-order-identical across engines.
  private val runningTotal: Q = (s, d) => {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d).filter(col("l_suppkey") % 211 === 0)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_extendedprice")).over(w), 4).as("running_revenue"),
        row_number().over(Window.partitionBy("l_suppkey")
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
          .cast("long").as("seq"))
  }
  private val runningTotalSql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
              round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS UNBOUNDED PRECEDING), 4) AS running_revenue,
              row_number() OVER (PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber) AS seq
       FROM lineitem WHERE l_suppkey % 211 = 0"""

  // §2.3 AS-OF join (engine extension; nearest reference analog is the
  // regrid as-of alignment, differencing_functions.py:2102–2106): for a
  // sample of probe events, attach the latest 'error' event of the same
  // user at-or-before the probe's timestamp. Spark side runs the
  // one-shuffle union+window form (ops.AsofJoin); the oracle is DuckDB's
  // native ASOF LEFT JOIN. The right side is pre-aggregated unique per
  // (user_id, ts) — equal-ts duplicates make ASOF nondeterministic.
  private val asofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val probes = ev.filter(col("event_id") % 101 === 0)
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 6).as("err_value"))
    graft.ops.AsofJoin.asof(probes, errors, "user_id", "ts", Seq("err_value"))
  }
  private val asofJoinSql =
    """SELECT l.event_id, l.user_id, l.ts,
              r.ts AS asof_ts, r.err_value AS asof_err_value
       FROM (SELECT event_id, user_id, ts FROM events
             WHERE event_id % 101 = 0) l
       ASOF LEFT JOIN
            (SELECT user_id, ts, round(max(value), 6) AS err_value
             FROM events WHERE event_type = 'error' GROUP BY 1, 2) r
         ON l.user_id = r.user_id AND l.ts >= r.ts"""

  // §2.3 AS-OF join, direction = NEAREST (pandas merge_asof semantics;
  // engine extension beside the backward o_asof_join): each probe gets
  // the same-user error event MINIMIZING |Δt|, ties resolving backward.
  // Spark side is ops.AsofJoin.asofNearest — the one-shuffle
  // union+double-window form; the oracle is the STRUCTURALLY DIFFERENT
  // naive argmin join (probe × user-errors, row_number by abs distance),
  // so the gate doubles as a second-method check of the window algebra.
  private val asofNearestQ: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val probes = ev.filter(col("event_id") % 101 === 0)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .groupBy("user_id", "us").agg(round(max("value"), 6).as("err_value"))
    graft.ops.AsofJoin.asofNearest(probes, errors, "user_id", "us",
      Seq("err_value"))
  }
  private val asofNearestSql =
    """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
                  WHERE event_id % 101 = 0),
        r AS (SELECT user_id, epoch_us(ts) AS us, round(max(value), 6) AS err_value
              FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        SELECT event_id, user_id, us, near_us, near_err_value FROM (
          SELECT l.event_id, l.user_id, l.us,
                 r.us AS near_us, r.err_value AS near_err_value,
                 row_number() OVER (PARTITION BY l.event_id
                   ORDER BY abs(r.us - l.us) ASC, r.us ASC) AS rn
          FROM l LEFT JOIN r ON r.user_id = l.user_id)
        WHERE rn = 1"""

  // §2.5 ranking/offset analytics (engine surface beyond the reference):
  // lag/lead/rank/ntile over a unique total order per supplier, so every
  // function is deterministic across engines.
  private val lagLead: Q = (s, d) => {
    val ord = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d).filter(col("l_suppkey") % 211 === 0)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(lag(col("l_quantity"), 1).over(ord), 6).as("prev_qty"),
        round(lead(col("l_quantity"), 1).over(ord), 6).as("next_qty"),
        rank().over(ord).cast("long").as("rnk"),
        ntile(4).over(ord).cast("long").as("quartile"))
  }
  private val lagLeadSql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
              round(lag(l_quantity, 1) OVER w, 6) AS prev_qty,
              round(lead(l_quantity, 1) OVER w, 6) AS next_qty,
              rank() OVER w AS rnk,
              ntile(4) OVER w AS quartile
       FROM lineitem WHERE l_suppkey % 211 = 0
       WINDOW w AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber)"""

  // ---- calendar-spine gap detection -------------------------------------
  // Hours of each active day with NO purchase events: a generated
  // day×hour spine anti-joined against the observed (day, hour) set — the
  // standard completeness check on an event feed (a 100-TB pipeline runs
  // exactly this shape to catch ingestion holes). The spine is generated
  // from the data's own distinct days (bounded: days × 24 rows), the
  // anti-join is a broadcast-able equi-join, and no raw event row
  // survives past the first DISTINCT.
  private val hourGaps: Q = (s, d) => {
    val p = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
      .distinct()
    val spine = p.select("day").distinct()
      .select(col("day"), explode(sequence(lit(0), lit(23))).as("hr"))
    spine.join(p, Seq("day", "hr"), "left_anti")
      .select(col("day"), col("hr").as("missing_hour"))
  }

  private val hourGapsSql =
    """WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
                         CAST(hour(ts) AS INT) AS hr
                  FROM events WHERE event_type = 'purchase'),
        days AS (SELECT DISTINCT day FROM p),
        spine AS (SELECT day, CAST(unnest(range(24)) AS INT) AS hr FROM days)
        SELECT day, hr AS missing_hour FROM spine
        WHERE NOT EXISTS (SELECT 1 FROM p
                          WHERE p.day = spine.day AND p.hr = spine.hr)"""

  val queries: Map[String, Q] = Map(
    "d_hour_gaps" -> hourGaps,
    "w_running_total" -> runningTotal,
    "w_lag_lead" -> lagLead,
    "o_asof_join" -> asofJoin,
    "o_asof_nearest" -> asofNearestQ,
    "g_wkt_assembly" -> wktAssembly,
    "g_poly_explode" -> polyExplode,
    "s_filter_project" -> filterProject,
    "s_assign_overwrite" -> assignOverwrite,
    "s_percentile_clip" -> percentileClip,
    "s_sym_range" -> symRange,
    "s_name_sanitize" -> nameSanitize,
    "s_source_classifier" -> sourceClassifier,
    "d_temporal_parse" -> temporalParse,
    "d_business_days" -> businessDays,
    "d_midpoint_epoch" -> midpointEpoch,
    "d_decimal_year" -> decimalYear,
    "d_gps_epoch" -> gpsEpoch,
    "j_json_extract" -> jsonExtract,
    "o_sort_limit" -> sortLimit,
    "o_zorder_curve" -> zorderCurve,
    "o_pick_index" -> pickIndex,
    "o_argmin_select" -> argminSelect,
    "set_except" -> setExcept,
    "set_intersect" -> setIntersect,
    "set_union" -> setUnion,
    "a_group_agg" -> groupAgg,
    "a_stats11" -> stats11,
    "a_rms_uncorrelated" -> rmsUncorrelated,
  )

  val oracle: Map[String, String] = Map(
    "d_hour_gaps" -> hourGapsSql,
    "w_running_total" -> runningTotalSql,
    "w_lag_lead" -> lagLeadSql,
    "o_asof_join" -> asofJoinSql,
    "o_asof_nearest" -> asofNearestSql,
    "g_wkt_assembly" -> wktAssemblySql,
    "g_poly_explode" -> polyExplodeSql,
    "s_filter_project" -> filterProjectSql,
    "s_assign_overwrite" -> assignOverwriteSql,
    "s_percentile_clip" -> percentileClipSql,
    "s_sym_range" -> symRangeSql,
    "s_name_sanitize" -> nameSanitizeSql,
    "s_source_classifier" -> sourceClassifierSql,
    "d_temporal_parse" -> temporalParseSql,
    "d_business_days" -> businessDaysSql,
    "d_midpoint_epoch" -> midpointEpochSql,
    "d_decimal_year" -> decimalYearSql,
    "d_gps_epoch" -> gpsEpochSql,
    "j_json_extract" -> jsonExtractSql,
    "o_sort_limit" -> sortLimitSql,
    "o_zorder_curve" -> zorderCurveSql,
    "o_pick_index" -> pickIndexSql,
    "o_argmin_select" -> argminSelectSql,
    "set_except" -> setExceptSql,
    "set_intersect" -> setIntersectSql,
    "set_union" -> setUnionSql,
    "a_group_agg" -> groupAggSql,
    "a_stats11" -> stats11Sql,
    "a_rms_uncorrelated" -> rmsUncorrelatedSql,
  )
}
