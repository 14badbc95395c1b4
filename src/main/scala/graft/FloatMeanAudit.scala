package graft

/** Mechanized order-dependent-float-mean audit (VERDICT r13 #2).
  *
  * The hash gate's premise is that one run represents a query — which a
  * raw `avg(double)` / `sum(double)` over a group whose size grows with
  * the scale factor can silently break: IEEE-754 addition is not
  * associative, so a different merge order (DuckDB morsel scheduling,
  * Spark partial-aggregate arrival) can flip the 6th decimal between two
  * runs of the SAME query on the SAME data. This bit twice (r12: pixel
  * grid fixture; r13: o_range_join's oracle at sf1). The house fix is
  * 1e-6-quantized long sums + one divide (integer addition IS
  * associative) — see QueriesExt.rangeJoin.
  *
  * Classification is TYPE-TRUE, not name-guessed: `runMain
  * graft.FloatMeanAudit` extracts every avg(/sum( argument from every
  * `SparkEntry.oracleSql` text (balanced-paren, with char offsets) into
  * FLOATMEANS_RAW.json; `tools/float_mean_probe.py` then asks DuckDB's
  * binder for each argument's type (rewriting the argument to
  * `(arg) & 0` — integer types bind, anything else raises a binder
  * error naming the type) and writes the content-keyed verdicts to
  * `tools/float_mean_types.json`. An aggregate is SAFE when it is
  * integer-typed (integer/decimal addition is exact in any order) or
  * carries the quantized-long-sum cast; every query with a remaining
  * genuine float aggregate must appear in [[whitelist]] with a reason.
  * FloatMeanAuditSpec fails on unwhitelisted float aggregates, on
  * unprobed (stale-artifact) aggregates, and on stale whitelist
  * entries. The main regenerates the checked-in FLOATMEANS.md report.
  */
object FloatMeanAudit {

  case class Agg(query: String, fn: String, arg: String,
                 argStart: Int, argEnd: Int, quantized: Boolean) {
    /** Content key into tools/float_mean_types.json — survives
      * reformatting elsewhere in the query. */
    def key: String = {
      val norm = arg.replaceAll("\\s+", " ").trim
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$query|$fn|$norm".getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString
    }
  }

  /** Queries allowed to keep a genuinely-DOUBLE-typed raw aggregate,
    * with the reason merge-order drift cannot flip the rounded output.
    * Reason taxonomy:
    *  - fixed-N: the aggregated group is a CONSTANT-size fixture (seeded
    *    range(N) / constant-step grid), so the summand count — and the
    *    worst-case reorder error — does not grow with sf.
    *  - bounded-group: group size bounded by a data-independent constant
    *    (score bins, zones, model grid).
    *  - quantized-upstream: every summand is an exact multiple of a
    *    fixed quantum ≥ 2^-20 (e.g. 6-dp-rounded values), and the group
    *    stays small enough that partial sums remain exactly
    *    representable (< 2^53 quanta). */
  val whitelist: Map[String, String] = Map(
    // fixed-N seeded fixtures: the aggregate runs over a constant-size
    // generator (range(N) draws / constant-step grids), so the summand
    // count never grows with sf and the r13 double-run audit at sf0.01+sf1
    // bounds the reorder slack under the 6-dp rounding
    "rng_gaussian" -> "fixed-N: 1000 seeded Box-Muller draws",
    "u_analytical_disk" -> "fixed-N: 1000 midpoint-rule steps",
    "u_brute_force" -> "fixed-N: 40x30 grid squared (1.44M const pairs)",
    "u_mc_correlated" -> "fixed-N: 20000 seeded MC pairs",
    "u_quadrature_total" -> "fixed-N: 16 polygon quadrature cells",
    "u_hugonnet" -> "fixed-N: 50 centers x constant per-center pair draw",
    "v_bootstrap_median" -> "fixed-N: 20 bootstrap draws over a 1500-point seeded sample",
    "v_cross_run" -> "fixed-N: 5 runs x 1500-sample bands (reference's own constant sampler cap)",
    "v_multirun_sample" -> "fixed-N: 5 runs x 1500-point seeded samples",
    "v_variogram" -> "fixed-N: banded pairs of a constant-size seeded sample (reference cap)",
    // bounded-group: group size is capped by a data-independent constant
    // (the 128x128 pixel grid, <=5 stack epochs, 36 aspect bins, <=9-cell
    // fill neighborhoods, 1e-4-quantized score bins) — the summand count
    // cannot grow with sf, and inputs are 6-dp-quantized upstream
    "i_geotiff_overviews" -> "bounded-group: fixed 128x128 raster (<=16384 6-dp cells)",
    "i_tiff_lod" -> "bounded-group: fixed 128x128 raster (<=16384 6-dp cells)",
    "m_auc" -> "bounded-group: 1e-4-quantized score bins (data-independent bin domain)",
    "r_coreg_aspect_diag" -> "bounded-group: fixed pixel grid, 36 aspect bins",
    "r_coreg_nuthkaab" -> "bounded-group: normal-equation sums over the fixed 128x128 grid",
    "r_dhdt_trend" -> "bounded-group: per-pixel regression over <=5 stack epochs",
    "r_dhdt_wls" -> "bounded-group: per-pixel WLS over <=5 stack epochs",
    "r_hypso_bands" -> "bounded-group: fixed pixel grid, 14 elevation bands",
    "r_hypso_fill" -> "bounded-group: fixed pixel grid, 14 elevation bands",
    "r_scan_valid" -> "bounded-group: fixed 128x128 raster of 6-dp values",
    "r_stable_anti" -> "bounded-group: fixed 128x128 raster of 6-dp values",
    "t_gapfill_2d" -> "bounded-group: per-cell IDW over <=R-radius neighbors (fixed-order rational sum)",
    "t_gapfill_idw" -> "bounded-group: per-cell IDW over <=R-radius neighbors (fixed-order rational sum)",
    "t_gapfill_smooth" -> "bounded-group: <=9-term 3x3 smoothing sums of 1e-6 quanta (exact)",
    // window frames: the accumulation order is pinned by the frame's
    // ORDER BY in both engines — run-deterministic by construction
    "w_running_total" -> "window-frame sum: frame sort fixes the accumulation order (run-deterministic)")

  /** Balanced-paren extraction of every avg(/sum( argument with char
    * offsets into the original SQL. */
  def findAggs(sql: String): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.Buffer[(String, Int, Int)]()
    val lower = sql.toLowerCase
    for (fn <- Seq("avg", "sum")) {
      var i = lower.indexOf(fn + "(")
      while (i >= 0) {
        val boundary = i == 0 ||
          (!lower(i - 1).isLetterOrDigit && lower(i - 1) != '_')
        if (boundary) {
          var depth = 1
          var j = i + fn.length + 1
          while (j < sql.length && depth > 0) {
            if (sql(j) == '(') depth += 1
            else if (sql(j) == ')') depth -= 1
            j += 1
          }
          if (depth == 0) out += ((fn, i + fn.length + 1, j - 1))
        }
        i = lower.indexOf(fn + "(", i + fn.length)
      }
    }
    out.toSeq
  }

  /** The quantized-long-sum pattern: the summand is cast to an integer
    * type before aggregation (sum of longs is merge-order-exact). */
  def isQuantized(arg: String): Boolean = {
    val a = arg.toUpperCase.replaceAll("\\s+", " ")
    a.contains("AS BIGINT") || a.contains("AS INT") || a.contains("::BIGINT") ||
    a.contains("AS LONG") || a.contains("AS HUGEINT") || a.contains("AS DECIMAL")
  }

  def scan(): Seq[Agg] =
    SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      findAggs(sql).map { case (fn, s, e) =>
        Agg(name, fn, sql.substring(s, e), s, e, isQuantized(sql.substring(s, e)))
      }
    }

  /** Binder-verdict artifact from tools/float_mean_probe.py:
    * key → DuckDB type name (e.g. BIGINT, HUGEINT, DOUBLE, DECIMAL...). */
  def probedTypes(): Map[String, String] = {
    val p = java.nio.file.Paths.get("tools/float_mean_types.json")
    if (!java.nio.file.Files.isRegularFile(p)) Map.empty
    else {
      val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      "\"([0-9a-f]{32})\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2)).toMap
    }
  }

  def isIntegerType(t: String): Boolean = {
    val u = t.toUpperCase
    u.contains("INT") || u.startsWith("DECIMAL") || u == "BOOLEAN"
  }

  sealed trait Status
  case object Quantized extends Status
  case class IntegerTyped(t: String) extends Status
  case class Whitelisted(t: String, reason: String) extends Status
  case class FloatViolation(t: String) extends Status
  case object Unprobed extends Status

  def classify(a: Agg, types: Map[String, String]): Status =
    if (a.quantized) Quantized
    else types.get(a.key) match {
      case None => Unprobed
      case Some(t) if isIntegerType(t) => IntegerTyped(t)
      case Some(t) => whitelist.get(a.query)
        .map(r => Whitelisted(t, r)).getOrElse(FloatViolation(t))
    }

  /** Float-typed raw aggregates in queries not covered by the whitelist,
    * plus aggregates the type artifact does not know (stale artifact). */
  def violations(): Seq[(Agg, Status)] = {
    val types = probedTypes()
    scan().map(a => (a, classify(a, types))).collect {
      case v @ (_, FloatViolation(_)) => v
      case v @ (_, Unprobed) => v
    }
  }

  /** Whitelist entries whose query no longer has any float-typed raw
    * aggregate (stale). */
  def staleWhitelist(): Seq[String] = {
    val types = probedTypes()
    val floatQueries = scan().filter { a =>
      !a.quantized && types.get(a.key).exists(t => !isIntegerType(t))
    }.map(_.query).toSet
    whitelist.keys.filterNot(floatQueries.contains).toSeq.sorted
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  def main(args: Array[String]): Unit = {
    val aggs = scan()
    // raw dump for the DuckDB binder probe (tools/float_mean_probe.py)
    val raw = new StringBuilder("{\n")
    raw ++= "\"sql\": {"
    raw ++= SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (n, s) => s"${jstr(n)}: ${jstr(s)}" }.mkString(",\n")
    raw ++= "},\n\"aggs\": [\n"
    raw ++= aggs.map { a =>
      s"""{"key": ${jstr(a.key)}, "query": ${jstr(a.query)}, "fn": ${jstr(a.fn)}, "start": ${a.argStart}, "end": ${a.argEnd}, "quantized": ${a.quantized}}"""
    }.mkString(",\n")
    raw ++= "\n]}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("FLOATMEANS_RAW.json"),
      raw.toString.getBytes("UTF-8"))

    val types = probedTypes()
    val classified = aggs.map(a => (a, classify(a, types)))
    val sb = new StringBuilder
    sb ++= "# Float-mean audit (generated by `runMain graft.FloatMeanAudit`)\n\n"
    sb ++= "Order-dependent float aggregates in oracle SQL: every `avg(`/`sum(`\n"
    sb ++= "argument is either integer/decimal-typed (DuckDB binder verdict via\n"
    sb ++= "tools/float_mean_probe.py — exact in any merge order), carries the\n"
    sb ++= "1e-6-quantized long-sum cast, or its query is whitelisted with a\n"
    sb ++= "reason (FloatMeanAudit.whitelist). FloatMeanAuditSpec gates this.\n\n"
    val nQ = classified.count(_._2 == Quantized)
    val nI = classified.count(_._2.isInstanceOf[IntegerTyped])
    val nW = classified.count(_._2.isInstanceOf[Whitelisted])
    val nV = classified.count(_._2.isInstanceOf[FloatViolation])
    val nU = classified.count(_._2 == Unprobed)
    sb ++= s"- aggregates scanned: ${aggs.size} across " +
      s"${aggs.map(_.query).distinct.size} queries (of ${SparkEntry.oracleSql.size})\n"
    sb ++= s"- quantized-long-sum casts: $nQ\n"
    sb ++= s"- integer/decimal-typed (binder verdict): $nI\n"
    sb ++= s"- float-typed, whitelisted: $nW in " +
      s"${classified.collect { case (a, Whitelisted(_, _)) => a.query }.distinct.size} queries\n"
    sb ++= s"- VIOLATIONS: $nV   UNPROBED: $nU\n\n"
    sb ++= "Float-typed aggregates (whitelisted or violating):\n\n"
    sb ++= "| query | fn | argument (truncated) | type | status |\n|---|---|---|---|---|\n"
    classified.foreach {
      case (a, Whitelisted(t, r)) =>
        sb ++= s"| ${a.query} | ${a.fn} | `${a.arg.replaceAll("\\s+", " ").replace("|", "\\|").take(80)}` | $t | whitelisted: $r |\n"
      case (a, FloatViolation(t)) =>
        sb ++= s"| ${a.query} | ${a.fn} | `${a.arg.replaceAll("\\s+", " ").replace("|", "\\|").take(80)}` | $t | **VIOLATION** |\n"
      case (a, Unprobed) =>
        sb ++= s"| ${a.query} | ${a.fn} | `${a.arg.replaceAll("\\s+", " ").replace("|", "\\|").take(80)}` | ? | **UNPROBED** |\n"
      case _ => ()
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("FLOATMEANS.md"),
      sb.toString.getBytes("UTF-8"))
    val stale = staleWhitelist()
    println(s"float-mean audit: ${aggs.size} aggregates | quantized $nQ | " +
      s"integer-typed $nI | whitelisted $nW | violations $nV | unprobed $nU | " +
      s"stale whitelist ${stale.size}")
    classified.foreach {
      case (a, FloatViolation(t)) =>
        println(s"  VIOLATION [$t] ${a.query} ${a.fn}(${a.arg.replaceAll("\\s+", " ").take(100)})")
      case _ => ()
    }
    stale.foreach(q => println(s"  STALE WHITELIST $q"))
    if (nV > 0 || nU > 0 || stale.nonEmpty) sys.exit(1)
  }
}
