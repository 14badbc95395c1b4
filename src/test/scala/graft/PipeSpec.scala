package graft

import org.apache.spark.sql.functions._
import graft.queries.QueriesPipe

/** Structurally-different second methods for the composed-pipeline
  * queries: each recomputes the query's answer imperatively on the
  * driver from the raw parquet (the oracle gate can't catch a conceptual
  * bug both engine formulations share — these can).
  */
class PipeSpec extends SparkSuite {

  private def docs(): Array[(Long, String, String)] =
    spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("x_pipeline_keep matches an imperative rule-chain sweep") {
    val stop = graft.text.TextOps.stopwords.toSet
    val all = docs()
    val prefixKeeper = all
      .map { case (id, t, _) => id -> t.split(" ", -1).take(8).mkString(" ") }
      .groupBy(_._2).map { case (_, g) => g.map(_._1).min -> g.map(_._1).toSet }
      .flatMap { case (keep, ids) => ids.map(_ -> keep) }
    val expected = all.map { case (id, t, lang) =>
      val w = t.split(" ", -1)
      val sr = w.count(stop) .toDouble / w.length
      val reason =
        if (id != prefixKeeper(id)) "duplicate"
        else if (w.length < 20) "too_short"
        else if (sr < 0.02) "low_stopword"
        else if (!Set("en", "es", "fr")(lang)) "lang_filter"
        else "keep"
      id -> reason
    }.toMap
    val got = QueriesPipe.queries("x_pipeline_keep")(spark, sf001)
      .select("doc_id", "reason", "keep").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.length == expected.size)
    for ((id, reason, keep) <- got) {
      assert(reason == expected(id), s"doc $id")
      assert(keep == (reason == "keep"))
    }
    // the fixture must actually exercise every rule, or the chain order
    // is untested
    val fired = got.map(_._2).toSet
    assert(fired == Set("duplicate", "too_short", "low_stopword",
      "lang_filter", "keep"), s"rules fired: $fired")
  }

  test("x_bm25_topk matches a driver-side BM25 recompute") {
    val all = docs()
    val n = all.length
    val dls = all.map { case (id, t, _) => id -> t.split(" ", -1).length }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val terms = Seq("spark", "table", "join")
    val tfs = for ((id, t, _) <- all; term <- terms;
                   tf = t.split(" ", -1).count(_ == term) if tf > 0)
      yield (id, term, tf)
    val dfm = tfs.groupBy(_._2).map { case (k, g) => k -> g.length }
    val idfQ = dfm.map { case (t, df) =>
      t -> math.floor(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6).toLong }
    val scores = tfs.groupBy(_._1).map { case (id, g) =>
      id -> g.map { case (_, term, tf) =>
        math.floor((idfQ(term) / 1e6) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dls(id) / avgdl)))) * 1e6)
          .toLong
      }.sum
    }
    val expected = scores.toSeq
      .map { case (id, sq) => (math.floor(sq / 1e6 * 1e6 + 0.5) / 1e6, id) }
      .sortBy { case (s, id) => (-s, id) }.take(10)
    val got = QueriesPipe.queries("x_bm25_topk")(spark, sf001)
      .orderBy("rank").collect().map(r => (r.getDouble(2), r.getLong(1)))
    assert(got.toSeq == expected,
      s"got ${got.toSeq}\nexpected $expected")
  }

  test("g_pagerank conserves rank mass and matches a driver recompute") {
    val edges = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(spark.read.parquet(s"$sf001/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = edges.flatMap { case (c, s) => Seq(c -> s, s -> c) }
    val deg = sym.groupBy(_._1).map { case (k, g) => k -> g.length }
    var r = deg.map { case (k, _) => k -> 1.0 }
    for (_ <- 1 to 3) {
      val contrib = r.map { case (k, v) =>
        k -> math.floor(1e9 * (v / deg(k).toDouble)).toLong }
      val in = sym.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map(e => contrib(e._1)).sum }
      r = in.map { case (k, s) => k -> (0.15 + 0.85 * (s.toDouble / 1e9)) }
    }
    // mass conservation: Σr stays ≈ N (teleport + quantized transfer);
    // each edge contribution loses < 1e-9 to the floor, so the deficit
    // is bounded by 0.85 * |edges| * 1e-9 per iteration
    val n = deg.size
    assert(math.abs(r.values.sum - n) < 0.01 * n)
    val expected = r.toSeq
      .map { case (k, v) => (math.floor(v * 1e6 + 0.5) / 1e6, k) }
      .sortBy { case (v, k) => (-v, k) }.take(20)
    val got = QueriesPipe.queries("g_pagerank")(spark, sf001)
      .orderBy("rank").collect().map(row => (row.getDouble(2), row.getLong(1)))
    assert(got.toSeq == expected)
  }

  test("m_ndcg matches a driver-side NDCG recompute") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val w = (1 to 10).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    val cum = w.scanLeft(0L)(_ + _).tail
    val expected = e.filter(_._1 < 5).map { case (qid, qv, ql) =>
      val cands = e.filter(_._1 != qid)
        .map { case (id, v, l) => (r6(cos(qv, v)), id, if (l == ql) 1L else 0L) }
        .sortBy { case (s, id, _) => (-s, id) }
      val nRel = cands.map(_._3).sum
      val dcg = cands.take(10).zipWithIndex
        .map { case ((_, _, rel), i) => rel * w(i) }.sum
      val ndcg = if (nRel == 0) 0.0
        else r6(dcg.toDouble / cum(math.min(nRel, 10L).toInt - 1).toDouble)
      (qid, nRel, ndcg)
    }.sortBy(_._1)
    val got = graft.queries.QueriesAnn.queries("m_ndcg")(spark, sf001)
      .orderBy("q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("m_pr_auc matches a driver recompute and tracks MLlib areaUnderPR") {
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
    val got = graft.queries.QueriesMl.queries("m_pr_auc")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((slice, rows) <- scored.groupBy(_._1)) {
      // same definition, imperative: cumulative (tp, fp) down the 100
      // score bins, trapezoid anchored at (R,P) = (0,1)
      val byBin = rows.groupBy { case (_, _, sc) => math.min(99L, math.floor(sc * 100).toLong) }
        .map { case (b, g) => (b, g.length.toLong, g.count(_._2 == 1).toLong) }
        .toSeq.sortBy(-_._1)
      val p = byBin.map(_._3).sum
      var tp = 0L; var fp = 0L; var ptp = 0L; var pfp = 0L
      var sum = 0L
      for ((_, n, pos) <- byBin) {
        tp += pos; fp += n - pos
        val term = (tp.toDouble / p - ptp.toDouble / p) *
          ((tp.toDouble / (tp + fp) +
            (if (ptp + pfp == 0) 1.0 else ptp.toDouble / (ptp + pfp))) / 2.0)
        sum += math.floor(term * 1e12).toLong
        ptp = tp; pfp = fp
      }
      val expected = math.floor(sum / 1e12 * 1e6 + 0.5) / 1e6
      assert(got(slice) == expected, s"$slice: ${got(slice)} != $expected")
      // independent convention check: MLlib's exact areaUnderPR on the
      // raw (score, label) pairs — binning coarsens, so tolerance-based
      val metrics = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(
        spark.sparkContext.parallelize(
          rows.toSeq.map { case (_, l, sc) => (sc, l.toDouble) }))
      assert(math.abs(metrics.areaUnderPR() - got(slice)) < 0.02,
        s"$slice: MLlib ${metrics.areaUnderPR()} vs ${got(slice)}")
    }
  }

  test("g_ppr matches a driver recompute and restarts only to seeds") {
    val edges = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(spark.read.parquet(s"$sf001/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val seedCust = spark.read.parquet(s"$sf001/customer.parquet")
      .filter(col("c_nationkey") === 0).select((col("c_custkey") * 2).as("n"))
      .collect().map(_.getLong(0)).toSet
    val sym = edges.flatMap { case (c, s) => Seq(c -> s, s -> c) }
    val deg = sym.groupBy(_._1).map { case (k, g) => k -> g.length }
    val seeds = deg.keySet.filter(seedCust)
    val restart = deg.map { case (k, _) =>
      k -> (if (seeds(k)) deg.size.toDouble / seeds.size else 0.0) }
    var r = restart
    for (_ <- 1 to 3) {
      val contrib = r.map { case (k, v) =>
        k -> math.floor(1e9 * (v / deg(k).toDouble)).toLong }
      val in = sym.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map(e => contrib(e._1)).sum }
      r = in.map { case (k, sm) =>
        k -> (0.15 * restart(k) + 0.85 * (sm.toDouble / 1e9)) }
    }
    val expected = r.toSeq
      .map { case (k, v) => (math.floor(v * 1e6 + 0.5) / 1e6, k) }
      .sortBy { case (v, k) => (-v, k) }.take(20)
    val got = QueriesPipe.queries("g_ppr")(spark, sf001)
      .orderBy("rank").collect().map(row => (row.getDouble(2), row.getLong(1)))
    assert(got.toSeq == expected)
    // personalization property: the restart vector must actually change
    // the ranking relative to uniform PageRank on the same graph, and
    // seed customers must outrank non-seed customers on average (the
    // graph is dense enough that hop-distance properties are vacuous)
    val uniTop = QueriesPipe.queries("g_pagerank")(spark, sf001)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got.map(_._2).toSeq != uniTop, "personalization changed nothing")
    val custRanks = r.toSeq.filter(_._1 % 2 == 0)
      .sortBy { case (k, v) => (-v, k) }.map(_._1).zipWithIndex.toMap
    val seedMean = seeds.toSeq.map(custRanks).sum.toDouble / seeds.size
    val others = custRanks.keySet -- seeds
    val otherMean = others.toSeq.map(custRanks).sum.toDouble / others.size
    assert(seedMean < otherMean,
      s"seed customers should outrank non-seeds ($seedMean vs $otherMean)")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def shingles(words: Array[String], k: Int): Array[String] =
    if (words.length < k) Array.empty
    else (0 to words.length - k).map(i => words.slice(i, i + k).mkString(" ")).toArray

  test("a_hll_est matches a driver-side HLL fold (registers, correction and all)") {
    val hexv = "0123456789abcdef"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).map { case (src, g) =>
      src -> g.flatMap(d => shingles(d._2.split(" ", -1), 3)).distinct
    }
    val smallTab = (1 to 64).map(v =>
      math.floor(64.0 * math.log(64.0 / v) * 1e6 + 0.5) / 1e6)
    val expected = bySource.map { case (src, grams) =>
      val regs = new Array[Int](64)
      grams.foreach { g =>
        val m = md5hex(g)
        val idx = ((hexv.indexOf(m(0)) * 16 + hexv.indexOf(m(1))) % 64)
        val w48 = (0 until 12).map(i =>
          hexv.indexOf(m(i + 2)).toLong * (1L << (4 * (11 - i)))).sum
        val rho = if (w48 == 0L) 49
          else 49 - java.lang.Long.toBinaryString(w48).length
        if (rho > regs(idx)) regs(idx) = rho
      }
      val vz = regs.count(_ == 0)
      val sint = regs.map(r => 1L << (49 - r)).sum
      val raw = ((0.709 * 4096.0) * 562949953421312.0) / sint.toDouble
      val est = if (raw <= 160.0 && vz > 0) smallTab(vz - 1)
        else math.floor(raw * 1e6 + 0.5) / 1e6
      val n = grams.length.toLong
      src -> ((n, est, math.floor((est - n.toDouble) / n.toDouble * 1e6 + 0.5) / 1e6))
    }
    val got = graft.queries.QueriesText.queries("a_hll_est")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == expected.size)
    got.foreach { case (src, v) =>
      assert(v == expected(src), s"hll mismatch at $src: got $v expect ${expected(src)}")
    }
  }

  test("x_bloom_decon matches a driver-side bloom build+probe; no false negatives") {
    val hexv = "0123456789abcdef"
    val all = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2 != null)
      .map { case (id, t) => (id, shingles(t.split(" ", -1), 8).distinct) }
    def positions(g: String): (Int, Int) = {
      val m = md5hex(g)
      def poly(off: Int) = (0 until 5).map(i =>
        hexv.indexOf(m(off + i)).toLong * (1L << (4 * (4 - i)))).sum % 16384L
      (poly(0).toInt, poly(5).toInt)
    }
    val evalGrams = all.filter(_._1 % 50 == 0).flatMap(_._2).distinct.toSet
    val bloom = new Array[Long](512)
    evalGrams.foreach { g =>
      val (p0, p1) = positions(g)
      bloom(p0 >> 5) |= 1L << (p0 % 32)
      bloom(p1 >> 5) |= 1L << (p1 % 32)
    }
    val expected = all.filter(_._1 % 50 != 0).map { case (id, grams) =>
      var nb = 0L; var nt = 0L; var fp = 0L
      grams.foreach { g =>
        val (p0, p1) = positions(g)
        val hit = ((bloom(p0 >> 5) >> (p0 % 32)) & 1L) == 1L &&
          ((bloom(p1 >> 5) >> (p1 % 32)) & 1L) == 1L
        val tru = evalGrams.contains(g)
        if (hit) nb += 1
        if (tru) nt += 1
        if (hit && !tru) fp += 1
        assert(!tru || hit, s"bloom false negative on gram of doc $id")
      }
      id -> ((grams.length.toLong, nb, nt, fp))
    }.toMap
    val got = QueriesPipe.queries("x_bloom_decon")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == expected.size)
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"bloom mismatch at doc $id: got $v expect ${expected(id)}")
    }
  }

  /** Driver recompute of the DSIR pipeline: doc_id → (n_words, s6). */
  private def dsirS6(): Map[Long, (Long, Long)] = {
    def bucket(w: String): Int = {
      val hex = md5hex(w)
      (("0123456789abcdef".indexOf(hex(0))) * 16 +
        "0123456789abcdef".indexOf(hex(1))) % 64
    }
    val all = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._2 != null)
    val inst = all.flatMap { case (id, t, lang) =>
      t.split(" ", -1).map(w => (id, w, lang)) }
    val byWord = inst.groupBy(_._2).map { case (w, g) =>
      w -> ((g.length.toLong, g.count(_._3 == "en").toLong, bucket(w)))
    }
    val byBucket = byWord.values.groupBy(_._3).map { case (b, g) =>
      b -> ((g.map(_._1).sum, g.map(_._2).sum))
    }
    val tr = byBucket.values.map(_._1).sum
    val tt = byBucket.values.map(_._2).sum
    val lr6 = byBucket.map { case (b, (cr, ct)) =>
      b -> math.floor(math.log(((ct + 1.0) / (tt + 64.0)) /
        ((cr + 1.0) / (tr + 64.0))) * 1e6 + 0.5).toLong
    }
    inst.groupBy(_._1).map { case (id, g) =>
      id -> ((g.length.toLong, g.map(i => lr6(byWord(i._2)._3)).sum))
    }
  }

  test("x_dsir_weights matches an imperative hashed-bucket recompute") {
    val expected = dsirS6().map { case (id, (n, s6)) =>
      id -> ((n, math.floor(s6.toDouble / 1e6 * 1e6 + 0.5) / 1e6))
    }
    val got = QueriesPipe.queries("x_dsir_weights")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == expected.size)
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"dsir mismatch at doc $id: got $v expect ${expected(id)}")
    }
  }

  test("x_dsir_resample matches a driver ES fold and prefers high-weight docs") {
    val s6 = dsirS6()
    val keyed = s6.toSeq.map { case (id, (_, s)) =>
      val u = (graft.rng.Rand.mixLong(id, 424242L).toDouble + 1.0) /
        (graft.rng.Rand.M.toDouble + 1.0)
      val key = math.floor(math.log(u) / math.exp(s.toDouble / 1e6) * 1e9 + 0.5) / 1e9
      (id, key, math.floor(s.toDouble / 1e6 * 1e6 + 0.5) / 1e6)
    }
    val expected = keyed.sortBy { case (id, k, _) => (-k, id) }.take(25)
      .zipWithIndex.map { case ((id, _, lw), i) => (i + 1L) -> ((id, lw)) }.toMap
    val got = QueriesPipe.queries("x_dsir_resample")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == expected.size)
    got.foreach { case (rk, v) =>
      assert(v == expected(rk), s"resample mismatch at rank $rk: got $v expect ${expected(rk)}")
    }
    // selection bias: weighted draws must overrepresent high-logw docs
    val meanAll = s6.values.map(_._2.toDouble / 1e6).sum / s6.size
    val meanSel = got.values.map(_._2).sum / got.size
    assert(meanSel > meanAll,
      s"resampled mean logw $meanSel should exceed corpus mean $meanAll")
  }

  test("x_mixture_budget conserves the budget and matches a driver recompute") {
    val shares = Map("en" -> 50L, "fr" -> 20L, "es" -> 15L, "de" -> 10L, "zh" -> 5L)
    val perLang = spark.read.parquet(s"$sf001/documents.parquet")
      .select("lang", "text").collect()
      .filter(_.getString(1) != null)
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).map { case (l, g) => l -> g.map(_._2).sum }
    val tt = perLang.values.sum
    val budget = tt / 2
    val expected = perLang.map { case (l, tokens) =>
      val sh = shares.getOrElse(l, 0L)
      val desired = budget * sh / 100
      l -> ((tokens, sh, desired, math.min(desired, tokens),
        math.floor(math.min(1.0, desired.toDouble / tokens.toDouble) * 1e6 + 0.5) / 1e6,
        math.max(0L, desired - tokens)))
    }
    val got = QueriesPipe.queries("x_mixture_budget")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getLong(6)))).toMap
    assert(got.size == expected.size)
    got.foreach { case (l, v) =>
      assert(v == expected(l), s"mixture mismatch at $l: got $v expect ${expected(l)}")
    }
    // allocation sanity: desired sums to ≤ the budget (shares sum to 100)
    assert(got.values.map(_._3).sum <= budget)
  }

  test("st_late_events matches an imperative per-user frontier sweep") {
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val ordered = g.sortBy(_._2)
      var frontier = Long.MinValue
      var nLate = 0L; var maxLate = 0L; var total = 0L
      for ((_, _, us) <- ordered) {
        if (frontier > us) {
          val late = frontier - us
          nLate += 1; maxLate = math.max(maxLate, late); total += late
        }
        frontier = math.max(frontier, us)
      }
      u -> ((ordered.length.toLong, nLate, maxLate, total))
    }
    val got = QueriesPipe.queries("st_late_events")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("a_cms_est matches a driver-side CMS and never underestimates") {
    import java.security.MessageDigest
    def md5hex(s: String) =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val words = docs().flatMap(_._2.split(" ", -1))
    val truth = words.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val hex = "0123456789abcdef"
    def cell(w: String, j: Int): Int = {
      val m = md5hex(w)
      (hex.indexOf(m(2 * j)) * 16 + hex.indexOf(m(2 * j + 1))) % 64
    }
    val counters = Array.ofDim[Long](4, 64)
    for ((w, c) <- truth; j <- 0 until 4) counters(j)(cell(w, j)) += c
    val est = truth.map { case (w, c) =>
      w -> (0 until 4).map(j => counters(j)(cell(w, j))).min }
    // guarantee over the WHOLE vocabulary, not just the query's top-20
    for ((w, c) <- truth) assert(est(w) >= c, s"underestimate for '$w'")
    val expected = truth.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
      .map { case (w, c) => (w, c, est(w), est(w) - c) }
    val got = graft.queries.QueriesText.queries("a_cms_est")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  test("x_kn_ppl matches a driver KN recompute; P(·|w1) sums to 1") {
    val texts = docs().map { case (id, t, _) => id -> t.split(" ", -1) }
    val bigrams = texts.flatMap { case (id, w) =>
      w.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1))) }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, g) => k -> g.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val n1fw = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.size.toLong }
    val n1bw = c2.groupBy(_._1._2).map { case (w2, g) => w2 -> g.size.toLong }
    val bTot = c2.size.toLong
    val D = 0.75
    def pKn(w1: String, w2: String): Double =
      (if (c2.contains((w1, w2))) (c2((w1, w2)) - D) / c1(w1) else 0.0) +
        ((D * n1fw(w1)) / c1(w1)) * (n1bw.getOrElse(w2, 0L).toDouble / bTot)
    // the defining property of interpolated KN: the conditional sums to
    // exactly 1 over the full vocabulary (discount mass == backoff mass)
    val vocab = n1bw.keySet
    for (w1 <- c1.keysIterator.take(5)) {
      val total = vocab.iterator.map(w2 => pKn(w1, w2)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"P(.|$w1) sums to $total")
    }
    // per-doc NLL recompute with the engine's per-type 1e-6 quantization
    val lp6 = c2.keys.map { case (w1, w2) =>
      (w1, w2) -> math.floor(math.log(pKn(w1, w2)) * 1e6 + 0.5).toLong }.toMap
    val expected = bigrams.groupBy(_._1).map { case (id, g) =>
      val s = g.map(b => lp6((b._2, b._3))).sum
      id -> ((g.length.toLong,
        math.floor(-s.toDouble / 1e6 / g.length * 1e6 + 0.5) / 1e6))
    }
    val got = graft.queries.QueriesText.queries("x_kn_ppl")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("x_dedup_spans matches a driver repeated-span sweep") {
    val K = 20
    val spans = docs().flatMap { case (id, t, _) =>
      t.split(" ", -1).sliding(K).filter(_.length == K)
        .map(w => (id, w.mkString(" ")))
    }
    val dupTexts = spans.groupBy(_._2)
      .filter { case (_, occ) => occ.map(_._1).distinct.length >= 2 }
      .keySet
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = spans.groupBy(_._1).map { case (id, occ) =>
      val nd = occ.count(o => dupTexts(o._2)).toLong
      id -> ((occ.length.toLong, nd, r6(nd.toDouble / occ.length)))
    }
    val got = graft.queries.QueriesText.queries("x_dedup_spans")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
    // planted near-dups must surface: some docs carry duplicated spans,
    // and docs shorter than K words are absent rather than zero-row noise
    assert(expected.values.exists(_._2 > 0))
    assert(expected.values.exists(_._2 == 0))
  }

  test("x_gopher_rules matches a driver recompute of the published thresholds") {
    val rows = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val stop = graft.text.TextOps.stopwords.toSet
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = rows.map { case (id, t, nc) =>
      val w = t.split(" ", -1)
      val nw = w.length.toLong
      val meanLen = r6((nc - (nw - 1)).toDouble / nw)
      val stopHits = w.count(stop).toLong
      val alpha = w.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val sym = t.count(_ == '#').toLong + raw"\.\.\.".r.findAllIn(t).length
      val rWc = if (nw >= 50 && nw <= 100000) 1 else 0
      val rMl = if (meanLen >= 3.0 && meanLen <= 10.0) 1 else 0
      val rSt = if (stopHits >= 2) 1 else 0
      val rAl = if (alpha.toDouble >= nw.toDouble * 0.8) 1 else 0
      val rSy = if (sym.toDouble <= nw.toDouble * 0.1) 1 else 0
      id -> ((nw, meanLen, stopHits, alpha, sym,
        rWc, rMl, rSt, rAl, rSy, rWc * rMl * rSt * rAl * rSy))
    }.toMap
    val got = graft.queries.QueriesText.queries("x_gopher_rules")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7),
        r.getInt(8), r.getInt(9), r.getInt(10), r.getInt(11)))).toMap
    assert(got == expected)
    // the rule set must actually discriminate on this corpus: some kept,
    // some dropped (else the test proves nothing about the thresholds)
    assert(expected.values.exists(_._11 == 1))
    assert(expected.values.exists(_._11 == 0))
  }

  test("x_ccnet_buckets buckets by per-lang KN-nll tercile thresholds") {
    val texts = docs().map { case (id, t, lang) => (id, t.split(" ", -1), lang) }
    val bigrams = texts.flatMap { case (id, w, _) =>
      w.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1))) }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, g) => k -> g.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val n1fw = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.size.toLong }
    val n1bw = c2.groupBy(_._1._2).map { case (w2, g) => w2 -> g.size.toLong }
    val bTot = c2.size.toLong
    val D = 0.75
    def pKn(w1: String, w2: String): Double =
      (c2((w1, w2)) - D) / c1(w1) +
        ((D * n1fw(w1)) / c1(w1)) * (n1bw(w2).toDouble / bTot)
    val lp6 = c2.keys.map { case (w1, w2) =>
      (w1, w2) -> math.floor(math.log(pKn(w1, w2)) * 1e6 + 0.5).toLong }.toMap
    val langOf = texts.map(t => t._1 -> t._3).toMap
    val scored = bigrams.groupBy(_._1).toSeq.map { case (id, g) =>
      val snll6 = -g.map(b => lp6((b._2, b._3))).sum
      (langOf(id), id, g.length.toLong, snll6,
        math.floor(snll6.toDouble / g.length + 0.5).toLong)
    }
    val expected = scored.groupBy(_._1).flatMap { case (lang, g) =>
      val sorted = g.map(_._5).sorted
      val n = g.size
      val t1 = sorted((math.ceil(n / 3.0) - 1).toInt)
      val t2 = sorted((math.ceil(2 * n / 3.0) - 1).toInt)
      g.groupBy(r => 1 + (if (r._5 > t1) 1 else 0) + (if (r._5 > t2) 1 else 0))
        .map { case (b, rs) =>
          val nb = rs.map(_._3).sum; val s6 = rs.map(_._4).sum
          val x = s6.toDouble / 1e6 / nb
          (lang, b) -> ((rs.size.toLong, nb, math.floor(x * 1e6 + 0.5) / 1e6))
        }
    }
    val got = graft.queries.QueriesText.queries("x_ccnet_buckets")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expected)
    // terciles partition every language's docs across 3 buckets with
    // threshold (not forced-equal-size) semantics
    for ((lang, g) <- scored.groupBy(_._1)) {
      val sizes = (1 to 3).map(b => got.getOrElse((lang, b), (0L, 0L, 0.0))._1)
      assert(sizes.sum == g.size, s"$lang buckets cover all docs")
      assert(sizes.forall(_ > 0), s"$lang has three nonempty buckets")
    }
  }

  test("x_kn3_ppl matches a driver recompute; trigram chain sums to 1") {
    val texts = docs().map { case (id, t, _) => id -> t.split(" ", -1) }
    val D = 0.75
    // bigram layer (identical to the x_kn_ppl recompute)
    val bi = texts.flatMap { case (_, w) => w.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))) }
    val c2 = bi.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val n1fw = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.size.toLong }
    val n1bw = c2.groupBy(_._1._2).map { case (w2, g) => w2 -> g.size.toLong }
    val bTot = c2.size.toLong
    def p2(w1: String, w2: String): Double =
      (if (c2.contains((w1, w2))) (c2((w1, w2)) - D) / c1(w1) else 0.0) +
        ((D * n1fw(w1)) / c1(w1)) * (n1bw.getOrElse(w2, 0L).toDouble / bTot)
    // trigram layer
    val tri = texts.flatMap { case (id, w) => w.sliding(3).filter(_.length == 3)
      .map(p => (id, p(0), p(1), p(2))) }
    val c123 = tri.groupBy(t => (t._2, t._3, t._4)).map { case (k, g) => k -> g.length.toLong }
    val c12 = c123.groupBy(k => (k._1._1, k._1._2)).map { case (k, g) => k -> g.values.sum }
    val n1fw12 = c123.groupBy(k => (k._1._1, k._1._2)).map { case (k, g) => k -> g.size.toLong }
    def p3(w1: String, w2: String, w3: String): Double =
      (if (c123.contains((w1, w2, w3))) (c123((w1, w2, w3)) - D) / c12((w1, w2)) else 0.0) +
        ((D * n1fw12((w1, w2))) / c12((w1, w2))) * p2(w2, w3)
    // chain normalization: backoff through a normalized P₂ keeps
    // Σ_w3 P₃(w3|w1w2) = 1 over the full vocabulary
    val vocab = texts.flatMap(_._2).toSet
    for ((w1, w2) <- c12.keysIterator.take(3)) {
      val total = vocab.iterator.map(w3 => p3(w1, w2, w3)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"P(.|$w1 $w2) sums to $total")
    }
    val lp6 = c123.keys.map { case (a, b, c) =>
      (a, b, c) -> math.floor(math.log(p3(a, b, c)) * 1e6 + 0.5).toLong }.toMap
    val expected = tri.groupBy(_._1).map { case (id, g) =>
      val s = g.map(t => lp6((t._2, t._3, t._4))).sum
      id -> ((g.length.toLong,
        math.floor(-s.toDouble / 1e6 / g.length * 1e6 + 0.5) / 1e6))
    }
    val got = graft.queries.QueriesText.queries("x_kn3_ppl")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("o_interval_union matches an imperative interval merge") {
    val iv = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) +
          expr("CAST(floor(value * 1e6 + 0.5) AS LONG)")).as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = iv.groupBy(_._1).map { case (u, g) =>
      val sorted = g.map { case (_, id, s, e) => (s, e, id) }.sortBy(identity)
      // classic merge: extend the open island while intervals touch it
      var islands = List.empty[(Long, Long)]
      for ((s, e, _) <- sorted) islands match {
        case (is, ie) :: rest if s <= ie =>
          islands = (is, math.max(ie, e)) :: rest
        case _ => islands = (s, e) :: islands
      }
      u -> ((islands.length.toLong, islands.map(i => i._2 - i._1).sum))
    }
    val got = QueriesPipe.queries("o_interval_union")(spark, sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("o_latest_by_key matches an imperative latest-wins fold") {
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val expected = ev.groupBy(e => (e._1, e._2)).map { case (k, g) =>
      val (_, _, id, _, v) = g.maxBy(e => (e._4, e._3))
      k -> ((id, math.floor(v * 1e6 + 0.5) / 1e6))
    }
    val got = QueriesPipe.queries("o_latest_by_key")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
  }

  test("st_join_enrich matches an imperative per-view click scan") {
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val expected = ev.filter(_._3 == "view").map { case (vid, u, _, vus) =>
      val hits = clicksByUser.getOrElse(u, Array.empty)
        .filter { case (_, _, _, cus) => cus >= vus && cus < vus + 3600000000L }
      (vid, u) -> (if (hits.isEmpty) None else Some(hits.map(_._1).min),
        hits.length.toLong)
    }.toMap
    val got = QueriesPipe.queries("st_join_enrich")(spark, sf001)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1)) ->
          ((if (r.isNullAt(2)) None else Some(r.getLong(2))), r.getLong(3))
      }.toMap
    assert(got == expected)
  }
}
