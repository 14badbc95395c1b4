package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.{QueriesExt2, QueriesAnn}

/** Second-method validation for round-2 operators: the DuckDB oracle
  * proves cross-engine agreement, but both engines could share a
  * misconception — these tests recompute the semantics with independent
  * driver-side Scala folds on sf0.001 and demand exact agreement.
  */
class ExtOpsSpec extends SparkSuite {

  test("w_ewma matches a driver-side fold of the same definition") {
    val rows = Tables.events(spark, sf001)
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    // reference: per user, order by (ts, event_id), EWMA over last 10
    val expect = rows.toSeq.groupBy(_._1).flatMap { case (uid, es) =>
      val ord = es.sortBy(e => (e._3.getTime, e._2))
      ord.zipWithIndex.map { case ((_, eid, _, _), i) =>
        val terms = (0 until 10).map { j =>
          val x = if (i - j >= 0) ord(i - j)._4 else 0.0
          x * (0.5 * math.pow(0.5, j))
        }
        // same fixed left-to-right association as the query expression
        val y = terms.reduceLeft(_ + _)
        (uid, eid) -> math.floor(y * 1e6 + 0.5) / 1e6
      }
    }.toMap
    val got = QueriesExt2.queries("w_ewma")(spark, sf001)
      .select("user_id", "event_id", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(v == expect(k), s"ewma mismatch at $k: got $v expect ${expect(k)}")
    }
  }

  test("v_weighted_sample equals the exact Efraimidis–Spirakis top-k") {
    val rows = Tables.events(spark, sf001)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def u01(key: Long): Double =
      (graft.rng.Rand.mixLong(key, 31337L).toDouble + 1.0) /
        (graft.rng.Rand.M.toDouble + 1.0)
    val expect = rows.toSeq.filter(_._3 > 0.0).groupBy(_._1).flatMap { case (et, es) =>
      es.map { case (_, eid, w) =>
        val skey = math.floor(math.log(u01(eid)) / w * 1e9 + 0.5) / 1e9
        (et, eid, skey)
      }.sortBy { case (_, eid, skey) => (-skey, eid) }
        .take(10).zipWithIndex
        .map { case ((_, eid, _), i) => (et, i + 1L) -> eid }
    }.toMap
    val got = QueriesExt2.queries("v_weighted_sample")(spark, sf001)
      .select("event_type", "rk", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got.size == expect.size)
    got.foreach { case (k, eid) =>
      assert(eid == expect(k), s"sample mismatch at $k: got $eid expect ${expect(k)}")
    }
  }

  test("n_pq_adc codes are the true per-subspace argmin codewords") {
    val vecs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cb = (0 until 8).map(k => vecs(k.toLong)) // codeword k = vector k
    def l2sq(a: Array[Double], b: Array[Double], off: Int): Double = {
      // same dot-identity association as the query: ((a·a − 2·a·b) + b·b)
      var aa = 0.0; var ab = 0.0; var bb = 0.0
      (0 until 8).foreach { i =>
        aa += a(off + i) * a(off + i)
        ab += a(off + i) * b(off + i)
        bb += b(off + i) * b(off + i)
      }
      (aa - (2.0 * ab)) + bb
    }
    // recompute each query vector's ADC distance to every candidate and
    // re-rank — must reproduce the query's top-3 exactly
    val codes = vecs.map { case (id, v) =>
      id -> (0 until 8).map { m =>
        (0 until 8).minBy { k =>
          val d = math.floor(l2sq(v, cb(k), m * 8) * 1e6 + 0.5) / 1e6
          (d, k)
        }
      }
    }
    val lut = (0 until 5).map { q =>
      q.toLong -> (0 until 8).map { m =>
        (0 until 8).map { k =>
          math.floor(l2sq(vecs(q.toLong), cb(k), m * 8) * 1e6 + 0.5).toLong
        }
      }
    }.toMap
    val expect = (0 until 5).flatMap { q =>
      vecs.keys.filter(_ != q.toLong).map { id =>
        val du = (0 until 8).map(m => lut(q.toLong)(m)(codes(id)(m))).sum
        (q.toLong, id, du)
      }.toSeq.sortBy { case (_, id, du) => (du, id) }.take(3).zipWithIndex
        .map { case ((qq, id, _), i) => (qq, i + 1L) -> id }
    }.toMap
    val got = QueriesAnn.queries("n_pq_adc")(spark, sf001)
      .select("q_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == expect.size)
    got.foreach { case (k, id) =>
      assert(id == expect(k), s"pq top-k mismatch at $k: got $id expect ${expect(k)}")
    }
  }

  test("w_rolling_median equals a driver-side sliding-window median") {
    val got = graft.queries.QueriesExt2.queries("w_rolling_median")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf001)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).flatMap { case (u, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 5), math.min(ordered.length, i + 6))
        val cents = frame.map(e => math.floor(e._4 * 100 + 0.5).toLong).sorted
        val n = cents.length
        val med = ((cents((n + 1) / 2 - 1) + cents(n / 2)).toDouble / 2.0) / 100.0
        (u, ordered(i)._2) -> ((n, med))
      }
    }
    assert(got.size == expected.size)
    got.foreach { case (k, v) =>
      assert(v == expected(k), s"rolling median mismatch at $k: got $v expect ${expected(k)}")
    }
  }

  test("w_hampel equals a driver-side median/MAD sweep") {
    val got = graft.queries.QueriesExt2.queries("w_hampel")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(got.nonEmpty)
    assert(got.values.exists(_._4), "fixture should flag at least one outlier")
    val rows = Tables.events(spark, sf001)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def med(xs: Seq[Long]): Double = {
      val s = xs.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s(n / 2)).toDouble / 2.0
    }
    val expected = rows.groupBy(_._1).flatMap { case (u, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 5), math.min(ordered.length, i + 6))
        val cents = frame.map(e => math.floor(e._4 * 100 + 0.5).toLong)
        val m = med(cents)
        val mad = med(cents.map(c => math.abs(4 * c - (2 * m).toLong * 2))) / 4.0
        val self = math.floor(ordered(i)._4 * 100 + 0.5)
        (u, ordered(i)._2) -> ((cents.length, m / 100.0, mad / 100.0,
          math.abs(self - m) > 3.0 * mad))
      }
    }
    assert(got.size == expected.size)
    got.foreach { case (k, v) =>
      assert(v == expected(k), s"hampel mismatch at $k: got $v expect ${expected(k)}")
    }
  }

  test("n_sq8_topk quantizes against true per-dim extrema and rescores exactly") {
    val vecs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = vecs.head._2.length
    val dmin = (0 until dim).map(d => vecs.values.map(_(d)).min).toArray
    val dmax = (0 until dim).map(d => vecs.values.map(_(d)).max).toArray
    def codes(v: Array[Double]): Array[Double] =
      (0 until dim).map { d =>
        if (dmax(d) == dmin(d)) 0.0
        else math.min(255.0, math.max(0.0,
          math.floor((v(d) - dmin(d)) / (dmax(d) - dmin(d)) * 255.0 + 0.5)))
      }.toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; (0 until dim).foreach(i => s += a(i) * b(i)); s
    }
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      math.floor(c * 1e6 + 0.5) / 1e6
    }
    val cded = vecs.map { case (id, v) => id -> codes(v) }
    val expect = (0 until 5).flatMap { q =>
      val qc = cded(q.toLong); val qv = vecs(q.toLong)
      val cands = vecs.keys.filter(_ != q.toLong).map { id =>
        (id, dot(qc, cded(id)).toLong)
      }.toSeq.sortBy { case (id, is) => (-is, id) }.take(10)
      cands.map { case (id, _) => (id, cos6(qv, vecs(id))) }
        .sortBy { case (id, sim) => (-sim, id) }.take(3).zipWithIndex
        .map { case ((id, sim), i) => (q.toLong, i + 1L) -> ((id, sim)) }
    }.toMap
    val got = QueriesAnn.queries("n_sq8_topk")(spark, sf001)
      .select("q_id", "rank", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.size == expect.size)
    got.foreach { case (k, idSim) =>
      assert(idSim == expect(k),
        s"sq8 top-k mismatch at $k: got $idSim expect ${expect(k)}")
    }
  }
}
