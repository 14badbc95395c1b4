package graft

import org.apache.spark.sql.functions._
import graft.queries.{QueriesMl, QueriesSql}

/** Plan + second-method validation for the ML-metrics and SQL-front-door
  * packs. The oracle gate proves value parity with DuckDB; these prove
  * (a) the PLANS are the scale-safe ones (subqueries decorrelate to hash
  * joins, metric windows partition by slice), and (b) the rank-sum AUC is
  * the Mann-Whitney statistic by direct O(P·N) pair comparison — a second
  * method the oracle can't provide (both engines could share a bug).
  */
class MlSqlSpec extends SparkSuite {

  private def planOf(qs: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame],
                     name: String): String =
    qs(name)(spark, sf001).queryExecution.executedPlan.toString

  test("q_sql_exists: EXISTS/NOT EXISTS decorrelate to semi/anti hash joins") {
    val p = planOf(QueriesSql.queries, "q_sql_exists")
    assert(p.contains("LeftSemi"), s"EXISTS should plan a left-semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS should plan a left-anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"decorrelation must not fall back to a nested loop:\n$p")
  }

  test("q_sql_scalar_in: scalar subquery evaluates once (Subquery), IN becomes a join") {
    val p = planOf(QueriesSql.queries, "q_sql_scalar_in")
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      s"mean should be a one-shot scalar subquery:\n$p")
    assert(p.contains("LeftSemi"), s"IN should plan a semi join:\n$p")
  }

  test("m_auc / m_lift_deciles: metric windows partition by slice (no global sort)") {
    for (q <- Seq("m_auc", "m_lift_deciles")) {
      val p = planOf(QueriesMl.queries, q)
      assert(!p.contains("SinglePartition"),
        s"$q must not move all rows to one partition:\n$p")
    }
  }

  test("rank-sum AUC equals brute-force pair-counting AUC (ties = 1/2)") {
    // Direct Mann-Whitney: over all (positive, negative) pairs count
    // score_p > score_n as 1, ties as 1/2. O(P·N) — fine at sf0.001.
    val rows = QueriesMl.queries("m_auc")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(3))).toMap

    val scored = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_id"), col("event_type"))
      .withColumn("p", graft.rng.Rand.u01(col("event_id"), 9101))
      .withColumn("label",
        when(graft.rng.Rand.u01(col("event_id"), 9202) < col("p"), 1).otherwise(0))
      .withColumn("raw",
        col("p") + (graft.rng.Rand.u01(col("event_id"), 9303) - lit(0.5)) * lit(0.6))
      .withColumn("score",
        graft.functions.Canon.round(greatest(lit(0.0), least(lit(1.0), col("raw"))), 4))
      .select("event_type", "label", "score").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))

    for ((slice, auc) <- rows) {
      val pos = scored.collect { case (s, 1, sc) if s == slice => sc }
      val neg = scored.collect { case (s, 0, sc) if s == slice => sc }
      var wins = 0.0
      for (sp <- pos; sn <- neg)
        wins += (if (sp > sn) 1.0 else if (sp == sn) 0.5 else 0.0)
      val brute = wins / (pos.length.toDouble * neg.length.toDouble)
      assert(math.abs(brute - auc) < 1e-6,
        s"$slice: rank-sum AUC $auc != brute-force $brute")
    }
  }

  test("m_auc matches MLlib BinaryClassificationMetrics.areaUnderROC") {
    // Third method: MLlib's exact ROC integration (numBins = 0) over the
    // same (score, label) pairs must agree with the rank-sum form —
    // MLlib's trapezoidal ROC area IS the tie-averaged Mann-Whitney
    // statistic, so agreement is exact up to float noise.
    val rows = QueriesMl.queries("m_auc")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(3))).toMap
    val scored = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_id"), col("event_type"))
      .withColumn("p", graft.rng.Rand.u01(col("event_id"), 9101))
      .withColumn("label",
        when(graft.rng.Rand.u01(col("event_id"), 9202) < col("p"), 1.0).otherwise(0.0))
      .withColumn("raw",
        col("p") + (graft.rng.Rand.u01(col("event_id"), 9303) - lit(0.5)) * lit(0.6))
      .withColumn("score",
        graft.functions.Canon.round(greatest(lit(0.0), least(lit(1.0), col("raw"))), 4))
    for ((slice, auc) <- rows) {
      val rdd = scored.filter(col("event_type") === slice)
        .select("score", "label").rdd
        .map(r => (r.getDouble(0), r.getDouble(1)))
      val mllibAuc = new org.apache.spark.mllib.evaluation
        .BinaryClassificationMetrics(rdd, 0).areaUnderROC()
      assert(math.abs(mllibAuc - auc) < 1e-6,
        s"$slice: MLlib AUC $mllibAuc != rank-sum $auc")
    }
  }

  test("m_confusion: ALL row equals the sum of the slice rows") {
    val rows = QueriesMl.queries("m_confusion")(spark, sf001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val all = rows.collect { case ("ALL", t) => t }.head
    val slices = rows.filter(_._1 != "ALL").map(_._2)
    val summed = slices.reduce((a, b) =>
      (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    assert(summed == all, s"slice sum $summed != ALL $all")
  }

  test("ANN recall: IVF multi-probe top-k covers most of the exact top-k") {
    // approximation-quality gate: for each probe query, what fraction of
    // the brute-force cosine top-k does the IVF (2-probe) path return?
    // Thresholds are loose lower bounds — bucketed ANN trades recall for
    // candidate count by design — but a broken bucketing would crater them.
    import graft.queries.QueriesAnn
    def pairs(q: String) = SparkEntry.queries(q)(spark, sf001).collect()
      .map(r => (r.getLong(r.fieldIndex("q_id")),
        r.getLong(r.fieldIndex("vec_id")))).toSet
    val exact = pairs("n_cosine_topk")
    val ivf1 = pairs("n_ivf_topk")
    val ivf2 = pairs("n_ivf_multiprobe")
    val r1 = ivf1.intersect(exact).size.toDouble / exact.size
    val r2 = ivf2.intersect(exact).size.toDouble / exact.size
    assert(r2 >= r1, s"multi-probe recall $r2 below single-probe $r1")
    assert(r2 >= 0.5, s"2-probe IVF recall $r2 suspiciously low")
    assert(exact.size == ivf1.size && exact.size == ivf2.size,
      "all paths must return k results per query")
  }

  test("a_nmad: zone NMAD matches a driver-side computation") {
    val rows = graft.queries.QueriesSql.queries("a_nmad")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toList
    val dz = graft.raster.PixelGrid.difference(
      graft.raster.PixelGrid.grid(spark, sf001, 0),
      graft.raster.PixelGrid.grid(spark, sf001, 1))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      val pos = 0.5 * (n - 1); val lo = s(pos.toInt); val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - math.floor(pos))
    }
    def zone(c: Int, r: Int): String =
      s"${((r >> 6) & 1) * 2 + ((c >> 6) & 1)}${((r >> 5) & 1) * 2 + ((c >> 5) & 1)}"
    val byZone = dz.groupBy { case (c, r, _) => zone(c, r) }
    for ((z, n, nmad) <- rows) {
      val vals = byZone(z).map(_._3).toSeq
      assert(vals.length == n)
      val med = median(vals)
      val expect = 1.4826 * median(vals.map(v => math.abs(v - med)))
      assert(math.abs(expect - nmad) < 1e-6, s"$z: $nmad vs driver $expect")
    }
  }

  test("funnel and retention match an imperative driver-side recompute") {
    // second method with a different algorithm shape: collect raw events
    // and fold them imperatively — guards against a conceptual bug
    // mirrored into both declarative formulations
    val events = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val byUser = events.groupBy(_._1)
    val W = 24L * 3600 * 1000000 // the query's 24-hour attribution window
    val stages = byUser.values.map { es =>
      // strict order: first view, first click AFTER it (within W), first
      // purchase AFTER that click (within W)
      es.filter(_._2 == "view").map(_._3).minOption match {
        case None => 0L
        case Some(v) =>
          es.filter(e => e._2 == "click" && e._3 > v && e._3 <= v + W)
            .map(_._3).minOption match {
            case None => 1L
            case Some(c) =>
              if (es.exists(e =>
                e._2 == "purchase" && e._3 > c && e._3 <= c + W)) 3L else 2L
          }
      }
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val q = graft.queries.QueriesSql.queries("st_funnel_stages")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(q == stages, s"funnel $q != driver $stages")

    val days = events.map { case (u, _, t) =>
      (u, java.time.Instant.ofEpochSecond(Math.floorDiv(t, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    }.distinct
    val cohort = days.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val cells = days.groupBy { case (u, d) =>
      (cohort(u), java.time.temporal.ChronoUnit.DAYS.between(cohort(u), d))
    }.map { case (k, v) => k -> v.map(_._1).distinct.size.toLong }
    val rq = graft.queries.QueriesSql.queries("st_retention_cohort")(spark, sf001)
      .collect().map(r => ((r.getDate(0).toLocalDate, r.getLong(1)), r.getLong(2))).toMap
    assert(rq == cells, s"retention differs: ${rq.size} vs ${cells.size} cells")
  }

  // Shared driver-side scorer twin (same counter-RNG as QueriesMl.scored)
  // for imperative second methods — a STRUCTURALLY different recompute, the
  // only check that can catch a conceptual bug both engines share.
  private def scoredRows(): Array[(String, Int, Double)] =
    spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_id"), col("event_type"))
      .withColumn("p", graft.rng.Rand.u01(col("event_id"), 9101))
      .withColumn("label",
        when(graft.rng.Rand.u01(col("event_id"), 9202) < col("p"), 1).otherwise(0))
      .withColumn("raw",
        col("p") + (graft.rng.Rand.u01(col("event_id"), 9303) - lit(0.5)) * lit(0.6))
      .withColumn("score",
        graft.functions.Canon.round(greatest(lit(0.0), least(lit(1.0), col("raw"))), 4))
      .select("event_type", "label", "score").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))

  test("m_roc_points: every (tp, fp) point matches direct threshold counting") {
    val scored = scoredRows()
    val pts = QueriesMl.queries("m_roc_points")(spark, sf001).collect()
    assert(pts.nonEmpty)
    for (r <- pts) {
      val (slice, bin, tp, fp) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val inSlice = scored.filter(_._1 == slice)
      def b(sc: Double) = math.min(99L, math.floor(sc * 100).toLong)
      val tpB = inSlice.count { case (_, l, sc) => l == 1 && b(sc) >= bin }.toLong
      val fpB = inSlice.count { case (_, l, sc) => l == 0 && b(sc) >= bin }.toLong
      assert(tp == tpB && fp == fpB,
        s"$slice bin $bin: query ($tp,$fp) != brute ($tpB,$fpB)")
    }
  }

  test("m_ks_score: KS equals direct two-sample CDF sweep") {
    val scored = scoredRows()
    val ks = QueriesMl.queries("m_ks_score")(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    for ((slice, (k, at)) <- ks) {
      val pos = scored.collect { case (s, 1, sc) if s == slice => sc }.sorted
      val neg = scored.collect { case (s, 0, sc) if s == slice => sc }.sorted
      val thr = (pos ++ neg).distinct.sorted
      var best = 0.0; var bestAt = Double.NaN
      for (t <- thr) {
        val d = math.abs(
          pos.count(_ <= t).toDouble / pos.length -
            neg.count(_ <= t).toDouble / neg.length)
        if (d > best + 1e-12) { best = d; bestAt = t }
      }
      assert(math.abs(best - k) < 1e-6, s"$slice: KS $k != brute $best")
      assert(math.abs(bestAt - at) < 1e-9, s"$slice: argmax $at != brute $bestAt")
    }
  }

  test("m_ece equals the integer-identity recompute from raw scores") {
    val scored = scoredRows()
    def compute(rows: Array[(String, Int, Double)]): (Long, Double, Double) = {
      val byBin = rows.groupBy { case (_, _, sc) =>
        math.min(9L, math.floor(sc * 10).toLong) }
      val n = rows.length.toLong
      val gaps = byBin.map { case (_, g) =>
        val s4 = g.map { case (_, _, sc) => math.round(sc * 10000) }.sum
        val pos = g.count(_._2 == 1).toLong
        (math.abs(pos * 10000L - s4), g.length.toLong)
      }
      val ece = gaps.map(_._1).sum.toDouble / (1e4 * n.toDouble)
      val mce = gaps.map { case (a, nb) => a.toDouble / (1e4 * nb.toDouble) }.max
      (n, math.floor(ece * 1e6 + 0.5) / 1e6, math.floor(mce * 1e6 + 0.5) / 1e6)
    }
    val expected = scored.groupBy(_._1).map { case (s, g) => s -> compute(g) } +
      ("ALL" -> compute(scored))
    val got = QueriesMl.queries("m_ece")(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.size == expected.size)
    got.foreach { case (s, v) =>
      assert(v == expected(s), s"ece mismatch at $s: got $v expect ${expected(s)}")
    }
  }

  test("n_ivfpq_topk: bucket-restricted ADC agrees with full-scan PQ ADC") {
    import graft.queries.QueriesAnn
    // same (q, vec) pair ⇒ same asymmetric distance whether the candidate
    // came through the IVF route or the full PQ scan
    val ivfpq = QueriesAnn.queries("n_ivfpq_topk")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val full = QueriesAnn.queries("n_pq_adc")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivfpq.nonEmpty)
    val shared = ivfpq.keySet.intersect(full.keySet)
    assert(shared.nonEmpty, "expected overlap between IVF-PQ and full PQ top-k")
    for (k <- shared)
      assert(ivfpq(k) == full(k), s"pair $k: adist ${ivfpq(k)} != ${full(k)}")
  }

  test("x_dedup_blocks matches an imperative block recount") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .collect { case r if !r.isNullAt(1) => (r.getLong(0), r.getString(1)) }
    val blocks = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      (0 until w.length / 10).map(i => (id, w.slice(i * 10, i * 10 + 10).mkString(" ")))
    }
    val docsPerBlock = blocks.groupBy(_._2).map { case (b, xs) =>
      b -> xs.map(_._1).distinct.size }
    val expected = blocks.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.size.toLong, xs.count(x => docsPerBlock(x._2) >= 2).toLong) }
    val got = graft.queries.QueriesText.queries("x_dedup_blocks")(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"block dedup differs: ${got.size} vs ${expected.size} docs")
  }

  test("m_brier matches a direct mean-squared recompute") {
    val scored = scoredRows()
    val rows = QueriesMl.queries("m_brier")(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((slice, brier) <- rows) {
      val xs = scored.filter(_._1 == slice)
      val direct = xs.map { case (_, l, sc) =>
        val e = sc - l; e * e }.sum / xs.length
      assert(math.abs(direct - brier) < 1e-6, s"$slice: $brier != $direct")
    }
  }

  test("d_hour_gaps matches an imperative spine sweep") {
    val present = graft.Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1))).toSet
    val days = present.map(_._1)
    val expected = for (d <- days; h <- 0 until 24; if !present((d, h))) yield (d, h)
    val got = graft.queries.QueriesCore.queries("d_hour_gaps")(spark, sf001)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getInt(1))).toSet
    assert(got == expected, s"gaps differ: ${got.size} vs ${expected.size}")
  }

  test("x_lang_confusion shares sum to 1 per actual language") {
    val rows = graft.queries.QueriesText.queries("x_lang_confusion")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    for ((lang, g) <- rows.groupBy(_._1)) {
      val share = g.map(_._3).sum
      assert(math.abs(share - 1.0) < 1e-4, s"$lang shares sum to $share")
    }
  }

  test("x_minhash_est: exact Jaccard column matches driver-side set math") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val rows = graft.queries.QueriesText.queries("x_minhash_est")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    for ((a, b, est, jac, err) <- rows) {
      val sa = shingles(docs(a)); val sb = shingles(docs(b))
      val inter = (sa intersect sb).size.toDouble
      val direct = inter / (sa.size + sb.size - inter)
      assert(math.abs(direct - jac) < 1e-6, s"($a,$b): jaccard $jac != $direct")
      assert(math.abs(math.abs(est - jac) - err) < 1e-6, s"($a,$b): err $err")
    }
  }

  test("v_poisson_boot: replicates behave like a bootstrap of the mean") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_quantity").cast("double")).collect().map(_.getDouble(0))
    val n = li.length.toDouble
    val mean = li.sum / n
    val sd = math.sqrt(li.map(q => (q - mean) * (q - mean)).sum / n)
    val se = sd / math.sqrt(n)
    val reps = graft.queries.QueriesVario.queries("v_poisson_boot")(spark, sf001)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(reps.length == 20)
    // effective sizes concentrate around n (Poisson(1) weights sum ~ n)
    for ((nEff, _) <- reps)
      assert(math.abs(nEff - n) < 6 * math.sqrt(n), s"n_eff $nEff vs n $n")
    // replicate means center on the true mean and spread like the SE
    val wm = reps.map(_._2)
    val mm = wm.sum / wm.length
    assert(math.abs(mm - mean) < 4 * se, s"mean of means $mm vs $mean (se $se)")
    val repSd = math.sqrt(wm.map(x => (x - mm) * (x - mm)).sum / wm.length)
    assert(repSd > 0.3 * se && repSd < 3 * se,
      s"replicate sd $repSd should approximate the SE $se")
  }

  test("o_salted_join: salted result equals the plain unsalted join result") {
    val salted = QueriesSql.queries("o_salted_join")(spark, sf001)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf001/part.parquet")
    val plain = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .groupBy((col("l_partkey") % 50).as("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.functions.Canon.round(col("l_extendedprice") * 100, 0)
          .cast("long")) / 100.0).as("total"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(salted.sameElements(plain), "salted join diverged from plain join")
  }
}
