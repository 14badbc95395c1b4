package graft.queries

import graft.functions.CacheRegistry.Shareable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon.round
import graft.Tables
import graft.ann.Similarity

/** Similarity-search queries over `embeddings`: brute-force cosine top-k
  * and an IVF (inverted-file) variant. Ranking is over the CANONICALLY
  * ROUNDED similarity (ties then broken by vec_id), so engine and oracle
  * rank identically even when raw doubles differ in the last ulp.
  */
object QueriesAnn {
  type Q = (SparkSession, String) => DataFrame

  private val NQUERIES = 5
  private val NCENTROIDS = 8
  private val TOPK = 3

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private val embSqlCte =
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  // ---- NDCG@10 of the cosine ranking -----------------------------------
  // Ranking-quality eval for the retrieval/ANN family: relevance = the
  // candidate shares the query vector's label; ranking = brute-force
  // cosine (the ground-truth ranking IVF/PQ approximate). The 1/log2(i+1)
  // discounts are PRECOMPUTED 1e-6 integers inlined as literals in both
  // engines — no runtime transcendental, and DCG/IDCG become exact
  // integer sums (same trick as the poisson CDF / charlm log-probs).
  private val NDCG_K = 10
  private val ndcgW: Seq[Long] = (1 to NDCG_K).map(i =>
    math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
  private val ndcgCum: Seq[Long] = ndcgW.scanLeft(0L)(_ + _).tail

  private val ndcg: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
    val q = e.filter(col("vec_id") < NQUERIES).toDF("q_id", "qv", "q_label")
    val cands = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("sim"),
        col("vec_id"),
        when(col("label") === col("q_label"), 1L).otherwise(0L).as("rel"))
    val wArr = array(ndcgW.map(lit): _*)
    val cArr = array(ndcgCum.map(lit): _*)
    cands
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)))
      .groupBy("q_id")
      .agg(sum("rel").as("n_rel"),
        sum(when(col("rank") <= NDCG_K,
          col("rel") * element_at(wArr, col("rank"))).otherwise(0L)).as("dcg_q"))
      .select(col("q_id"), col("n_rel"),
        when(col("n_rel") === 0, lit(0.0)).otherwise(
          round(col("dcg_q").cast("double") /
            element_at(cArr, least(col("n_rel"), lit(NDCG_K.toLong)).cast("int"))
              .cast("double"), 6)).as("ndcg10"))
  }

  private val ndcgSql = {
    val wList = ndcgW.mkString("[", ", ", "]")
    val cList = ndcgCum.mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                   FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM e
              WHERE vec_id < $NQUERIES),
        cands AS (SELECT q_id,
                         round(${Similarity.cosineSql("qv", "e.v")}, 6) AS sim,
                         vec_id,
                         CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel
                  FROM e JOIN q ON vec_id <> q_id),
        ranked AS (SELECT q_id, rel,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
                   FROM cands),
        agg AS (SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel,
                       CAST(sum(CASE WHEN rank <= $NDCG_K
                                     THEN rel * ($wList)[rank]
                                     ELSE 0 END) AS BIGINT) AS dcg_q
                FROM ranked GROUP BY 1)
        SELECT q_id, n_rel,
               CASE WHEN n_rel = 0 THEN 0.0
                    ELSE round(CAST(dcg_q AS DOUBLE) /
                           CAST(($cList)[CAST(least(n_rel, $NDCG_K) AS INT)] AS DOUBLE),
                           6) END AS ndcg10
        FROM agg"""
  }

  // ---- MRR@10 of the cosine ranking -------------------------------------
  // Mean-reciprocal-rank eval beside m_ndcg: per query, 1/rank of the
  // FIRST relevant candidate (same label) within the top 10, 0 if none —
  // the standard first-hit retrieval metric. Rank ties are pinned by
  // (rounded sim DESC, vec_id ASC) as everywhere in this family; the
  // reciprocal is canonically rounded, so both engines emit identical
  // doubles. Same broadcast-queries × candidates shape as m_ndcg.
  private val mrr: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
    val q = e.filter(col("vec_id") < NQUERIES).toDF("q_id", "qv", "q_label")
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("sim"),
        col("vec_id"),
        when(col("label") === col("q_label"), 1L).otherwise(0L).as("rel"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rank") <= NDCG_K)
      .groupBy("q_id")
      .agg(sum("rel").as("n_rel_top10"),
        round(coalesce(max(when(col("rel") === 1,
          lit(1.0) / col("rank"))), lit(0.0)), 6).as("mrr10"))
  }

  private val mrrSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                   FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM e
              WHERE vec_id < $NQUERIES),
        ranked AS (SELECT q_id, vec_id,
                          CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel,
                          row_number() OVER (PARTITION BY q_id ORDER BY
                            round(${Similarity.cosineSql("qv", "e.v")}, 6) DESC,
                            vec_id ASC) AS rank
                   FROM e JOIN q ON vec_id <> q_id)
        SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel_top10,
               round(coalesce(max(CASE WHEN rel = 1
                                       THEN 1.0 / rank END), 0.0), 6) AS mrr10
        FROM ranked WHERE rank <= $NDCG_K
        GROUP BY 1"""

  // ---- Matryoshka truncation recall --------------------------------------
  // The MRL question (Kusupati et al. 2022): how much retrieval quality
  // survives if vectors are truncated to a prefix of their dimensions?
  // Per query: top-10 by FULL-dim cosine (truth) vs top-10 by PREFIX-16
  // cosine (64-dim embeddings → 4× cheaper scan), recall = overlap/10 —
  // the go/no-go measurement before deploying truncated embeddings at
  // 100 TB. Both rankings share one broadcast-candidates frame (persisted
  // — two windows consume it); prefix slices happen in-row, and the final
  // overlap is an equi-join of two 10-row-per-query sets. Ties pinned by
  // (rounded sim DESC, vec_id ASC) as everywhere in the family.
  private val MRL_DIM = 16
  private val matryoshka: Q = (s, d) => {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < NQUERIES).toDF("q_id", "qv")
    val cands = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("sim_full"),
        round(Similarity.cosine(slice(col("qv"), 1, MRL_DIM),
          slice(col("v"), 1, MRL_DIM)), 6).as("sim_pre"))
      .persistShared()
    def top(simCol: String) = cands
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col(simCol).desc, col("vec_id").asc)))
      .filter(col("rank") <= NDCG_K)
      .select(col("q_id"), col("vec_id"))
    top("sim_full")
      .join(top("sim_pre").withColumn("hit", lit(1L)),
        Seq("q_id", "vec_id"), "left_outer")
      .groupBy("q_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .select(col("q_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / NDCG_K.toDouble, 6)
          .as("recall10"))
  }

  private val matryoshkaSql =
    s"""WITH e AS ($embSqlCte),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQUERIES),
        cands AS (SELECT q_id, vec_id,
                         round(${Similarity.cosineSql("qv", "e.v")}, 6) AS sim_full,
                         round(${Similarity.cosineSql(s"qv[1:$MRL_DIM]", s"e.v[1:$MRL_DIM]")}, 6) AS sim_pre
                  FROM e JOIN q ON vec_id <> q_id),
        tf AS (SELECT q_id, vec_id FROM
                 (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
                    ORDER BY sim_full DESC, vec_id ASC) AS rank FROM cands)
               WHERE rank <= $NDCG_K),
        tp AS (SELECT q_id, vec_id FROM
                 (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
                    ORDER BY sim_pre DESC, vec_id ASC) AS rank FROM cands)
               WHERE rank <= $NDCG_K)
        SELECT tf.q_id, CAST(sum(CASE WHEN tp.vec_id IS NOT NULL
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
               round(CAST(sum(CASE WHEN tp.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) / ${NDCG_K.toDouble}, 6) AS recall10
        FROM tf LEFT JOIN tp ON tp.q_id = tf.q_id AND tp.vec_id = tf.vec_id
        GROUP BY 1"""

  // ---- brute-force cosine top-k ----------------------------------------
  private val cosineTopk: Q = (s, d) => {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < NQUERIES).toDF("q_id", "qv")
    val sims = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("sim"))
    // rank cast to long: DuckDB row_number() is BIGINT, Spark's is INT —
    // outputs must serialize as the same type
    sims.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc))
        .cast("long"))
      .filter(col("rank") <= TOPK)
  }

  private val cosineTopkSql =
    s"""WITH e AS ($embSqlCte),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQUERIES),
        sims AS (
          SELECT q_id, vec_id, round(${Similarity.cosineSql("qv", "v")}, 6) AS sim
          FROM e, q WHERE vec_id <> q_id)
        SELECT q_id, vec_id, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank
        FROM sims
        QUALIFY rank <= $TOPK"""

  // ---- IVF: assign to nearest centroid, probe own cluster only ----------
  private val ivfTopk: Q = (s, d) => {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < NCENTROIDS).toDF("c_id", "cv")
    val assigned = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cluster"))
    val q = assigned.filter(col("vec_id") < NQUERIES)
      .toDF("q_id", "qv", "q_cluster")
    q.join(assigned, col("cluster") === col("q_cluster") &&
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_cluster").as("cluster"), col("vec_id"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc))
        .cast("long"))
      .filter(col("rank") <= TOPK)
  }

  private val ivfTopkSql =
    s"""WITH e AS ($embSqlCte),
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NCENTROIDS),
        assigned AS (
          SELECT vec_id, v, c_id AS cluster
          FROM (SELECT e.vec_id, e.v, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1),
        q AS (SELECT vec_id AS q_id, v AS qv, cluster AS q_cluster
              FROM assigned WHERE vec_id < $NQUERIES)
        SELECT q_id, q_cluster AS cluster, vec_id,
               round(${Similarity.cosineSql("qv", "v")}, 6) AS sim,
               row_number() OVER (PARTITION BY q_id ORDER BY
                 round(${Similarity.cosineSql("qv", "v")}, 6) DESC, vec_id ASC) AS rank
        FROM q JOIN assigned a ON a.cluster = q.q_cluster AND a.vec_id <> q.q_id
        QUALIFY rank <= $TOPK"""

  // ---- embedding norms + label centroid stats (vector column hygiene) ---
  // per-label groups grow with sf → integer-exact mean (1e-6-quantized
  // long sum, one divide — float-mean audit house convention)
  private val embStats: Q = (s, d) =>
    emb(s, d).join(Tables.embeddings(s, d).select("vec_id", "label"), "vec_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(sum(floor(Similarity.norm(col("v")) * 1e6 + 0.5).cast("long"))
          .cast("double") / (count(lit(1)).cast("double") * 1e6), 6)
          .as("mean_norm"),
        round(min(Similarity.norm(col("v"))), 6).as("min_norm"),
        round(max(Similarity.norm(col("v"))), 6).as("max_norm"))

  private val embStatsSql =
    s"""WITH e AS (SELECT label, ${Similarity.normSql("CAST(embedding AS DOUBLE[])")} AS nrm
                   FROM embeddings)
        SELECT label, count(*) AS n,
               round(CAST(sum(CAST(floor(nrm * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                     / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_norm,
               round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm
        FROM e GROUP BY 1"""

  // ---- IVF multi-probe: queries search their TOP-2 centroid buckets —
  // the standard recall lever (candidates stay an equi-join on cluster id;
  // probe count scales coverage linearly, never quadratically)
  private val ivfMultiprobe: Q = (s, d) => {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < NCENTROIDS).toDF("c_id", "cv")
    val ranked = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
    val assigned = ranked.filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cluster"))
    val probes = ranked.filter(col("crn") <= 2 && col("vec_id") < NQUERIES)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("c_id").as("cluster"), col("crn").cast("long").as("probe"))
    probes.join(assigned, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("probe"), col("cluster"), col("vec_id"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc))
        .cast("long"))
      .filter(col("rank") <= TOPK)
  }

  private val ivfMultiprobeSql =
    s"""WITH e AS ($embSqlCte),
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NCENTROIDS),
        ranked AS (
          SELECT vec_id, v, c_id,
                 round(${Similarity.cosineSql("cv", "v")}, 6) AS csim,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY round(${Similarity.cosineSql("cv", "v")}, 6) DESC,
                                             c_id ASC) AS crn
          FROM e, cents c),
        assigned AS (SELECT vec_id, v, c_id AS cluster FROM ranked WHERE crn = 1),
        probes AS (SELECT vec_id AS q_id, v AS qv, c_id AS cluster, crn AS probe
                   FROM ranked WHERE crn <= 2 AND vec_id < $NQUERIES)
        SELECT q_id, probe, p.cluster AS cluster, a.vec_id,
               round(${Similarity.cosineSql("qv", "v")}, 6) AS sim,
               row_number() OVER (PARTITION BY q_id ORDER BY
                 round(${Similarity.cosineSql("qv", "v")}, 6) DESC, a.vec_id ASC) AS rank
        FROM probes p JOIN assigned a ON a.cluster = p.cluster
        WHERE a.vec_id <> p.q_id
        QUALIFY rank <= $TOPK"""

  // ---- one k-means centroid-update step (IVF training shape): assign
  // every vector to its nearest centroid, then recompute centroids as the
  // element-wise mean per cluster. posexplode → groupBy(cluster, dim) is
  // the scale form: the shuffle carries (cluster, dim) partial sums, never
  // whole vectors to one place.
  private val kmeansStep: Q = (s, d) => {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < NCENTROIDS).toDF("c_id", "cv")
    val assigned = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
    // per-(cluster, dim) groups grow with sf → integer-exact mean
    // (1e-6-quantized long sum, one divide — float-mean audit)
    assigned
      .select(col("c_id").as("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(count(lit(1)).as("n"),
        round(sum(floor(col("x") * 1e6 + 0.5).cast("long")).cast("double") /
          (count(lit(1)).cast("double") * 1e6), 6).as("mean_x"))
  }

  private val kmeansStepSql =
    s"""WITH e AS ($embSqlCte),
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NCENTROIDS),
        assigned AS (
          SELECT vec_id, v, c_id AS cluster
          FROM (SELECT e.vec_id, e.v, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1)
        SELECT cluster, CAST(dim - 1 AS INT) AS dim, count(*) AS n,
               round(CAST(sum(CAST(floor(v[dim] * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                     / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mean_x
        FROM assigned, (SELECT unnest(range(1, 65)) AS dim)
        GROUP BY 1, 2"""

  // ---- embedding-cosine near-dup (the 5th dedup method of the training-
  // data mandate, beside exact/MinHash/SimHash/Jaccard): candidate pairs
  // come from the IVF bucket equi-join — two vectors are candidates only
  // when they share a nearest centroid — then exact cosine ≥ threshold
  // confirms. At 100 TB the shuffle carries cluster ids, never the O(N²)
  // pair space; recall is tuned by probing top-P buckets per vector
  // (n_ivf_multiprobe shape) and resolution by the centroid count.
  private val DUP_SIM = 0.35
  // Cluster count for the two within-cluster ALL-PAIRS dedup surfaces
  // (x_dedup_embcos, x_semdedup): k = max(NCENTROIDS, ceil(n/256)) holds
  // per-cluster occupancy at ~256, so the pair stage is n·128 — LINEAR
  // in corpus size (the r14 sf3 sweep caught the fixed-8-cluster form
  // going quadratic: 6.0×/8.5× wall for 3× data). Assignment is n·k
  // broadcast dot products — shuffle-free, data-parallel, and the
  // documented cost of exact IVF assignment at scale (a production
  // pipeline swaps in hierarchical assignment; the pair stage, which
  // was the wall-clock problem, stays linear). Both engines derive k
  // from the same count, so the oracle stays lockstep at every sf; the
  // other IVF consumers (the kNN census gate pair, n_ivf_*) keep the
  // fixed NCENTROIDS fixture.
  private[graft] def ivfKFor(n: Long): Int =
    math.max(NCENTROIDS.toLong, (n + 255) / 256).toInt
  private val ivfKSqlParams =
    s"params AS (SELECT greatest($NCENTROIDS, (count(*) + 255) // 256) AS k FROM e)"

  private val dedupEmbcos: Q = (s, d) => {
    val e = emb(s, d)
    val k = ivfKFor(e.count())
    val cents = e.filter(col("vec_id") < k).toDF("c_id", "cv")
    val assigned = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
      // norm precomputed ONCE per vector — the pair stage below touches
      // O(cluster·occ) pairs and must not re-fold both arrays per pair
      .select(col("vec_id"), col("v"), Similarity.norm(col("v")).as("nrm"),
        col("c_id").as("cluster"))
      // both sides of the pair self-join read the assignment — without
      // the persist the n·k broadcast-assign subtree executes twice
      .persistShared()
    val a = assigned.toDF("a_id", "av", "anrm", "cluster")
    val b = assigned.toDF("b_id", "bv", "bnrm", "cluster")
    a.join(b, Seq("cluster")).filter(col("a_id") < col("b_id"))
      .select(col("cluster"), col("a_id"), col("b_id"),
        round(Similarity.dot(col("av"), col("bv")) /
          (col("anrm") * col("bnrm")), 6).as("sim"))
      // threshold on the ROUNDED similarity so the cut is bit-identical
      .filter(col("sim") >= DUP_SIM)
  }

  private val dedupEmbcosSql =
    s"""WITH e AS ($embSqlCte),
        $ivfKSqlParams,
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e
                  WHERE vec_id < (SELECT k FROM params)),
        assigned AS (
          SELECT vec_id, v, c_id AS cluster
          FROM (SELECT e.vec_id, e.v, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1)
        SELECT a.cluster, a.vec_id AS a_id, b.vec_id AS b_id,
               round(${Similarity.cosineSql("a.v", "b.v")}, 6) AS sim
        FROM assigned a JOIN assigned b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round(${Similarity.cosineSql("a.v", "b.v")}, 6) >= $DUP_SIM"""

  // ---- product quantization + asymmetric distance (ADC) -----------------
  // The compressed-domain ANN scale path: vectors are encoded ONCE into
  // M=8 one-byte codes (nearest codeword per 8-dim subspace; codebooks are
  // the first-K vectors' subvectors, the same deterministic convention as
  // the IVF centroids). A query then scans CODES, not vectors: its
  // distance table (NQ×M×K = 320 rounded entries) broadcasts, and the scan
  // is M integer lookups + an integer sum per candidate — at 100 TB the
  // 64-double column never leaves storage after encoding, an 8× payload
  // cut with no pairwise float work. LUT entries are micros-scaled BIGINTs
  // so the per-candidate sum is integer-exact (invariant #2: Spark's
  // partial-agg order and DuckDB's fold agree bit-for-bit); ranking orders
  // by that exact integer with vec_id tie-breaks (invariant #4).
  private val PQM = 8      // subspaces
  private val PQK = 8      // codewords per subspace
  private val PQD = 8      // dims per subspace (64 / PQM)
  // l2² via dot-product identity with FIXED parenthesization — both
  // engines evaluate ((a·a − 2·a·b) + b·b) on list_dot_product parity
  private def l2sq(a: Column, b: Column): Column =
    (Similarity.dot(a, a) - (lit(2.0) * Similarity.dot(a, b))) +
      Similarity.dot(b, b)
  private def l2sqSql(a: String, b: String): String =
    s"((${Similarity.dotSql(a, a)} - (2.0 * ${Similarity.dotSql(a, b)})) + ${Similarity.dotSql(b, b)})"

  private val pqAdc: Q = (s, d) => {
    val subs = emb(s, d)
      .withColumn("m", explode(sequence(lit(0), lit(PQM - 1))))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * PQD + 1, lit(PQD)).as("sub"))
    val cb = subs.filter(col("vec_id") < PQK)
      .select(col("vec_id").as("k"), col("m"), col("sub").as("cw"))
    val enc = subs.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("k"),
        round(l2sq(col("sub"), col("cw")), 6).as("dd"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(col("dd").asc, col("k").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("k").as("code"))
    val lut = subs.filter(col("vec_id") < NQUERIES)
      .join(broadcast(cb), "m")
      .select(col("vec_id").as("q_id"), col("m"), col("k"),
        round(l2sq(col("sub"), col("cw")) * 1e6, 0).cast("long").as("du"))
    enc.join(broadcast(lut),
        enc("m") === lut("m") && enc("code") === lut("k"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum("du").as("du"))
      .select(col("q_id"), col("vec_id"),
        round(col("du") / 1e6, 6).as("adist"), col("du"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("du").asc, col("vec_id").asc))
        .cast("long"))
      .filter(col("rank") <= TOPK)
      .drop("du")
  }

  private val pqAdcSql =
    s"""WITH e AS ($embSqlCte),
        subs AS (SELECT vec_id, m,
                        list_slice(v, m * $PQD + 1, m * $PQD + $PQD) AS sub
                 FROM e, (SELECT unnest(range($PQM)) AS m)),
        cb AS (SELECT vec_id AS k, m, sub AS cw FROM subs WHERE vec_id < $PQK),
        enc AS (SELECT vec_id, m, k AS code FROM (
                  SELECT s.vec_id, s.m, c.k,
                         row_number() OVER (PARTITION BY s.vec_id, s.m
                           ORDER BY round(${l2sqSql("s.sub", "c.cw")}, 6) ASC,
                                    c.k ASC) AS rn
                  FROM subs s JOIN cb c ON s.m = c.m)
                WHERE rn = 1),
        lut AS (SELECT s.vec_id AS q_id, s.m, c.k,
                       CAST(round(${l2sqSql("s.sub", "c.cw")} * 1e6, 0) AS BIGINT) AS du
                FROM subs s JOIN cb c ON s.m = c.m WHERE s.vec_id < $NQUERIES),
        adc AS (SELECT q_id, vec_id, CAST(sum(du) AS BIGINT) AS du
                FROM enc JOIN lut ON enc.m = lut.m AND enc.code = lut.k
                WHERE vec_id <> q_id GROUP BY 1, 2)
        SELECT q_id, vec_id, round(du / 1e6, 6) AS adist,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY du ASC, vec_id ASC) AS rank
        FROM adc QUALIFY rank <= $TOPK"""

  // ---- composed IVF + PQ/ADC top-k (the production ANN shape) -----------
  // The two scale levers COMPOSED, as a real 100-TB ANN service runs them:
  // IVF routing prunes the candidate set to the query's nearest-centroid
  // bucket (an equi-join on cluster id — the probe count is the recall
  // lever, n_ivf_multiprobe), then the scan inside the bucket reads PQ
  // CODES, not vectors (8 integer LUT lookups per candidate, the 8×
  // payload cut of n_pq_adc). No full-vector distance is ever computed at
  // query time; the only float work is the NQ×M×K LUT built against the
  // broadcast codebooks. LUT entries are micros-scaled BIGINTs ⇒ the
  // per-candidate sum is integer-exact and the ranking deterministic.
  private val ivfpqTopk: Q = (s, d) => {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < NCENTROIDS).toDF("c_id", "cv")
    val assigned = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("c_id").as("cluster"))
    val subs = emb(s, d)
      .withColumn("m", explode(sequence(lit(0), lit(PQM - 1))))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * PQD + 1, lit(PQD)).as("sub"))
    val cb = subs.filter(col("vec_id") < PQK)
      .select(col("vec_id").as("k"), col("m"), col("sub").as("cw"))
    val enc = subs.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("k"),
        round(l2sq(col("sub"), col("cw")), 6).as("dd"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(col("dd").asc, col("k").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("k").as("code"))
    val lut = subs.filter(col("vec_id") < NQUERIES)
      .join(broadcast(cb), "m")
      .select(col("vec_id").as("lq_id"), col("m").as("lm"), col("k").as("lk"),
        round(l2sq(col("sub"), col("cw")) * 1e6, 0).cast("long").as("du"))
    val q = assigned.filter(col("vec_id") < NQUERIES)
      .toDF("q_id", "q_cluster")
    val cand = q.join(assigned,
        col("cluster") === col("q_cluster") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("cluster"))
    cand.join(enc, "vec_id")
      .join(broadcast(lut), col("q_id") === col("lq_id") &&
        col("m") === col("lm") && col("code") === col("lk"))
      .groupBy("q_id", "cluster", "vec_id")
      .agg(sum("du").as("du"))
      .select(col("q_id"), col("cluster"), col("vec_id"),
        round(col("du") / 1e6, 6).as("adist"), col("du"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("du").asc, col("vec_id").asc))
        .cast("long"))
      .filter(col("rank") <= TOPK)
      .drop("du")
  }

  private val ivfpqTopkSql =
    s"""WITH e AS ($embSqlCte),
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NCENTROIDS),
        assigned AS (
          SELECT vec_id, c_id AS cluster
          FROM (SELECT e.vec_id, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1),
        subs AS (SELECT vec_id, m,
                        list_slice(v, m * $PQD + 1, m * $PQD + $PQD) AS sub
                 FROM e, (SELECT unnest(range($PQM)) AS m)),
        cb AS (SELECT vec_id AS k, m, sub AS cw FROM subs WHERE vec_id < $PQK),
        enc AS (SELECT vec_id, m, k AS code FROM (
                  SELECT s.vec_id, s.m, c.k,
                         row_number() OVER (PARTITION BY s.vec_id, s.m
                           ORDER BY round(${l2sqSql("s.sub", "c.cw")}, 6) ASC,
                                    c.k ASC) AS rn
                  FROM subs s JOIN cb c ON s.m = c.m)
                WHERE rn = 1),
        lut AS (SELECT s.vec_id AS q_id, s.m, c.k,
                       CAST(round(${l2sqSql("s.sub", "c.cw")} * 1e6, 0) AS BIGINT) AS du
                FROM subs s JOIN cb c ON s.m = c.m WHERE s.vec_id < $NQUERIES),
        q AS (SELECT vec_id AS q_id, cluster AS q_cluster
              FROM assigned WHERE vec_id < $NQUERIES),
        cand AS (SELECT q.q_id, a.vec_id, a.cluster
                 FROM q JOIN assigned a
                   ON a.cluster = q.q_cluster AND a.vec_id <> q.q_id),
        adc AS (SELECT cand.q_id, cand.cluster, cand.vec_id,
                       CAST(sum(du) AS BIGINT) AS du
                FROM cand
                JOIN enc ON enc.vec_id = cand.vec_id
                JOIN lut ON lut.q_id = cand.q_id AND lut.m = enc.m
                        AND lut.k = enc.code
                GROUP BY 1, 2, 3)
        SELECT q_id, cluster, vec_id, round(du / 1e6, 6) AS adist,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY du ASC, vec_id ASC) AS rank
        FROM adc QUALIFY rank <= $TOPK"""

  // ---- clustering quality: per-cluster cosine inertia -------------------
  // Σ(1 − best_csim) per cluster — the objective a k-means/IVF trainer
  // watches per step. best_csim is the already-rounded assignment
  // similarity, so each cost term is 1e-6-quantized to an exact integer
  // (round lands the ±ulp of (1−csim)·1e6 on the integer) and the
  // aggregate is exact under any merge order.
  private val inertia: Q = (s, d) => {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < NCENTROIDS).toDF("c_id", "cv")
    val best = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
      .select(col("c_id").as("cluster"),
        round((lit(1.0) - col("csim")) * 1e6, 0).cast("long").as("cost6"))
    best.groupBy("cluster")
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("cost6")).cast("double") / 1e6, 6).as("total_cost"),
        round(sum(col("cost6")).cast("double") / 1e6 /
          count(lit(1)).cast("double"), 6).as("mean_cost"))
  }

  private val inertiaSql =
    s"""WITH e AS ($embSqlCte),
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NCENTROIDS),
        best AS (
          SELECT c_id AS cluster,
                 CAST(round((1.0 - csim) * 1e6, 0) AS BIGINT) AS cost6
          FROM (SELECT e.vec_id, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1)
        SELECT cluster, count(*) AS n_vectors,
               round(CAST(CAST(sum(cost6) AS BIGINT) AS DOUBLE) / 1e6, 6) AS total_cost,
               round(CAST(CAST(sum(cost6) AS BIGINT) AS DOUBLE) / 1e6
                     / CAST(count(*) AS DOUBLE), 6) AS mean_cost
        FROM best GROUP BY 1"""

  // ---- int8 scalar quantization + exact rescore (SQ8) -------------------
  // The third compressed-domain ANN flavor beside PQ/ADC: each dimension
  // is affine-mapped to an 8-bit code against per-dimension [min, max]
  // trained in one aggregate pass — a 4x payload cut (and integer-SIMD
  // scoring) that, unlike PQ, needs no codebook and reconstructs each dim
  // independently. The scan scores CODES with an integer dot product
  // (values ≤ 64·255² ≪ 2⁵³, so the double-typed fold is exact and
  // cross-engine deterministic — invariant #2), keeps the top
  // SQ_RESCORE candidates per query, and rescores ONLY those with exact
  // float cosine — the asymmetric refine step a production SQ8 index
  // runs. At 100 TB the full-width vector column is read only for the
  // ~SQ_RESCORE·NQ rescore rows; codes come from a crossJoin with a
  // broadcast 1-row stats frame, never a shuffle.
  private val SQDIM = 64
  private val SQ_RESCORE = 10

  private val sq8Topk: Q = (s, d) => {
    val e = emb(s, d)
    val dims = e.select(posexplode(col("v")).as(Seq("dim0", "x")))
      .groupBy("dim0").agg(min("x").as("mn"), max("x").as("mx"))
    val stats = dims
      .agg(array_sort(collect_list(struct(col("dim0"), col("mn")))).as("smn"),
        array_sort(collect_list(struct(col("dim0"), col("mx")))).as("smx"))
      .select(transform(col("smn"), t => t.getField("mn")).as("dmin"),
        transform(col("smx"), t => t.getField("mx")).as("dmax"))
    // quantize: floor(((x − lo) / (hi − lo)) · 255 + 0.5), parenthesized
    // identically in both engines; constant dims (hi = lo) code to 0
    val codes = transform(sequence(lit(1), lit(SQDIM)), dcol => {
      val x = element_at(col("v"), dcol)
      val lo = element_at(col("dmin"), dcol)
      val hi = element_at(col("dmax"), dcol)
      when(hi === lo, lit(0.0)).otherwise(
        least(lit(255.0), greatest(lit(0.0),
          floor((x - lo) / (hi - lo) * lit(255.0) + lit(0.5)).cast("double"))))
    })
    val coded = e.crossJoin(broadcast(stats))
      .select(col("vec_id"), col("v"), codes.as("c"))
      .persistShared()
    val q = coded.filter(col("vec_id") < NQUERIES).toDF("q_id", "qv", "qc")
    coded.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("qv"), col("v"),
        Similarity.dot(col("qc"), col("c")).cast("long").as("iscore"))
      .withColumn("arank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("iscore").desc, col("vec_id").asc)))
      .filter(col("arank") <= SQ_RESCORE)
      .select(col("q_id"), col("vec_id"), col("iscore"),
        round(Similarity.cosine(col("qv"), col("v")), 6).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc))
        .cast("long"))
      .filter(col("rank") <= TOPK)
  }

  private val sq8TopkSql =
    s"""WITH e AS ($embSqlCte),
        dims AS (SELECT d AS dim, min(v[d]) AS mn, max(v[d]) AS mx
                 FROM e, (SELECT unnest(range(1, ${SQDIM + 1})) AS d)
                 GROUP BY 1),
        stats AS (SELECT list(mn ORDER BY dim) AS dmin,
                         list(mx ORDER BY dim) AS dmax
                  FROM dims),
        coded AS (SELECT vec_id, v,
                         list_transform(range(1, ${SQDIM + 1}), d ->
                           CASE WHEN dmax[d] = dmin[d] THEN 0.0
                                ELSE least(255.0, greatest(0.0,
                                  floor(((v[d] - dmin[d]) / (dmax[d] - dmin[d]))
                                        * 255.0 + 0.5))) END) AS c
                  FROM e, stats),
        q AS (SELECT vec_id AS q_id, v AS qv, c AS qc
              FROM coded WHERE vec_id < $NQUERIES),
        approx AS (SELECT q_id, vec_id, qv, coded.v AS v,
                          CAST(${Similarity.dotSql("qc", "c")} AS BIGINT) AS iscore,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY CAST(${Similarity.dotSql("qc", "c")} AS BIGINT) DESC,
                                     vec_id ASC) AS arank
                   FROM coded JOIN q ON vec_id <> q_id)
        SELECT q_id, vec_id, iscore,
               round(${Similarity.cosineSql("qv", "v")}, 6) AS sim,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY round(${Similarity.cosineSql("qv", "v")}, 6) DESC,
                          vec_id ASC) AS rank
        FROM approx WHERE arank <= $SQ_RESCORE
        QUALIFY rank <= $TOPK"""

  // ---- x_semdedup: SemDeDup keep/drop census (Abbas et al. 2023,
  // arXiv:2303.09540) — the published semantic-dedup pipeline for web-
  // scale training corpora. x_dedup_embcos LISTS near-dup pairs; this
  // surface makes the DECISION: cluster embeddings (k-means assignment,
  // the IVF fixture centroids), and within each cluster DROP any item
  // that has an ε-neighbor sitting FARTHER from the centroid — the
  // paper's keep-LOW-centroid-similarity rule, which keeps the diverse /
  // atypical member of every near-dup ball (§3.2 there; lower csim =
  // kept). Ties on csim break by id (smaller id wins). At 100 TB the
  // pair space stays the per-cluster equi-join (never O(N²) global);
  // the verdict is one aggregation over a left-semi-shaped mark join.
  // Output: per-cluster census — totals, drops, and exact kept-set
  // checksums (id sum + 1e-6-integer csim sum) that pin the kept SET,
  // not just its size.
  private val SEM_EPS = 0.35
  private val semdedup: Q = (s, d) => {
    val e = emb(s, d)
    // derived cluster count — see ivfKFor: holds the within-cluster
    // pair stage linear in corpus size
    val k = ivfKFor(e.count())
    val cents = e.filter(col("vec_id") < k).toDF("c_id", "cv")
    // assigned feeds three consumers (pair sides a/b + the final census):
    // persist, or the broadcast-assign subtree runs 3×
    val assigned = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), Similarity.norm(col("v")).as("nrm"),
        col("c_id").as("cluster"), col("csim"))
      .persistShared()
    val a = assigned.select(col("vec_id").as("a_id"), col("v").as("av"),
      col("nrm").as("anrm"), col("cluster"), col("csim").as("a_csim"))
    val b = assigned.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("nrm").as("bnrm"), col("cluster"), col("csim").as("b_csim"))
    // b is dominated (dropped) when an ε-neighbor a is closer to the
    // centroid; threshold on the ROUNDED cosine so the cut is exact
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("a_id") =!= col("b_id") &&
        round(Similarity.dot(col("av"), col("bv")) /
          (col("anrm") * col("bnrm")), 6) >= SEM_EPS &&
        (col("a_csim") < col("b_csim") ||
          (col("a_csim") === col("b_csim") && col("a_id") < col("b_id"))))
      .select(col("cluster"), col("b_id").as("vec_id")).distinct()
      .withColumn("is_drop", lit(1L))
    assigned.join(dropped, Seq("cluster", "vec_id"), "left_outer")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_total"),
        sum(coalesce(col("is_drop"), lit(0L))).as("n_dropped"),
        sum(when(col("is_drop").isNull, col("vec_id")).otherwise(0L))
          .as("kept_id_sum"),
        sum(when(col("is_drop").isNull,
          floor(col("csim") * 1e6 + 0.5).cast("long")).otherwise(0L))
          .as("kept_csim_e6"))
  }

  private val semdedupSql =
    s"""WITH e AS ($embSqlCte),
        $ivfKSqlParams,
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e
                  WHERE vec_id < (SELECT k FROM params)),
        assigned AS (
          SELECT vec_id, v, c_id AS cluster, csim
          FROM (SELECT e.vec_id, e.v, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1),
        dropped AS (
          SELECT DISTINCT b.cluster, b.vec_id
          FROM assigned a JOIN assigned b
            ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
          WHERE round(${Similarity.cosineSql("a.v", "b.v")}, 6) >= $SEM_EPS
            AND (a.csim < b.csim OR (a.csim = b.csim AND a.vec_id < b.vec_id)))
        SELECT s.cluster, count(*) AS n_total,
               CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               CAST(sum(CASE WHEN d.vec_id IS NULL THEN s.vec_id ELSE 0 END) AS BIGINT)
                 AS kept_id_sum,
               CAST(sum(CASE WHEN d.vec_id IS NULL
                             THEN CAST(floor(csim * 1e6 + 0.5) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS kept_csim_e6
        FROM assigned s LEFT JOIN dropped d
          ON d.cluster = s.cluster AND d.vec_id = s.vec_id
        GROUP BY 1"""

  // ---- g_knn_triangles: triangle census of the bucketed kNN graph ------
  // Embedding-space QA for the dedup/ANN family: each vector takes its
  // top-3 cosine neighbors WITHIN its IVF bucket (nearest of the fixed
  // centroids — the n_ivf_topk assignment), the undirected union of those
  // arcs is the kNN graph, and the triangle count + global clustering
  // coefficient (3·triangles / wedges) measure how cohesive the
  // embedding clusters are — the standard sanity check before
  // graph-based semantic dedup. Scale shape: candidate pairs are an
  // equi-join on cluster id (the IVF path, never all-pairs), the
  // triangle join runs on ≤ k·n canonical (a<b) edges, and wedges come
  // from a degree aggregate — no step is quadratic in corpus size.
  private val KNN_K = 3
  private val knnTriangles: Q = (s, d) => {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < NCENTROIDS).toDF("c_id", "cv")
    val assigned = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cluster"))
    val r = assigned.toDF("r_vec_id", "r_v", "r_cluster")
    val knn = assigned.join(r, col("cluster") === col("r_cluster") &&
        col("vec_id") =!= col("r_vec_id"))
      .select(col("vec_id"), col("r_vec_id"),
        round(Similarity.cosine(col("v"), col("r_v")), 6).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("r_vec_id").asc)))
      .filter(col("rank") <= KNN_K)
    val edges = knn.select(least(col("vec_id"), col("r_vec_id")).as("a"),
        greatest(col("vec_id"), col("r_vec_id")).as("b"))
      .distinct().persistShared()
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val wedges = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .agg(sum((col("deg") * (col("deg") - 1) / lit(2)).cast("long"))
        .as("n_wedges"))
    val tri = edges
      .join(edges.toDF("b", "c"), "b")
      .join(edges.toDF("a", "c"), Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    nEdges.crossJoin(wedges).crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0)).otherwise(
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("global_cc"))
  }

  private val knnTrianglesSql =
    s"""WITH e AS ($embSqlCte),
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NCENTROIDS),
        assigned AS (
          SELECT vec_id, v, c_id AS cluster
          FROM (SELECT e.vec_id, e.v, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1),
        knn AS (
          SELECT vec_id, r_vec_id FROM (
            -- project the quantized cosine BEFORE the window: with the
            -- expression inline in ORDER BY, DuckDB drags BOTH 64-double
            -- vectors through the rank sort's runs — at sf1's ~5e7
            -- within-cluster pairs that is a ~70 GB spill; projected,
            -- the sort holds three narrow columns (~1 GB). Same values,
            -- same quantization, same tiebreak.
            SELECT a.vec_id, b.vec_id AS r_vec_id,
                   round(${Similarity.cosineSql("a.v", "b.v")}, 6) AS sim
            FROM assigned a JOIN assigned b
              ON a.cluster = b.cluster AND a.vec_id <> b.vec_id)
          QUALIFY row_number() OVER (PARTITION BY vec_id
            ORDER BY sim DESC, r_vec_id ASC) <= $KNN_K),
        edges AS (SELECT DISTINCT least(vec_id, r_vec_id) AS a,
                         greatest(vec_id, r_vec_id) AS b FROM knn),
        deg AS (SELECT n, count(*) AS deg
                FROM (SELECT a AS n FROM edges
                      UNION ALL SELECT b AS n FROM edges) GROUP BY 1),
        w AS (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
              FROM deg),
        t AS (SELECT count(*) AS n_triangles
              FROM edges e1 JOIN edges e2 ON e2.a = e1.b
                            JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
        c AS (SELECT count(*) AS n_edges FROM edges)
        SELECT n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges = 0 THEN 0.0
                    ELSE round(3.0 * n_triangles / n_wedges, 6) END AS global_cc
        FROM c, w, t"""

  // ---- g_knn_triangles_sampled: the 100-TB form of the triangle census —
  // bucketed-probe candidate capping. The exact census enumerates ALL
  // within-cluster pairs (n²/C — ~5×10⁷ at sf1, the most expensive single
  // query there at 13.2 s cache-cold; right as a GATE, wrong as the
  // production default). This variant sub-quantizes each IVF cluster with
  // a 6-bit random-hyperplane band (64 sub-buckets, planes 100..105 of
  // the shared sign-plane family) and, multiprobe-LSH style, each
  // vector's candidate pool is its own sub-bucket plus the 6 buckets at
  // Hamming distance 1 — 7/64 of the cluster in expectation, a ~9× pair
  // cut whose factor GROWS with cluster size (the knob a 100-TB run
  // turns up: more bits, same plan shape). Everything downstream (top-3
  // by exact cosine on candidates only, undirected edge union, degree
  // wedges, triangle join) is the exact query's shape; the output adds
  // the candidate-pair count so the cut is measured, not asserted. The
  // exact form stays beside it as the gate — the
  // x_lsh_recall / x_lsh_recall_sampled pattern.
  // The bit count is DERIVED FROM THE DATA (r13 shipped it as the
  // SPARK_GRAFT_KNN_SBITS env var with the deployment rule in a comment;
  // VERDICT r13 #1 asked for the rule to become code): both engines
  // compute mean codebook-cell occupancy occ = ceil(n / NCENTROIDS)
  // from the same corpus count and take the smallest b with occ / 2^b ≤ 32
  // (b = ceil(log2(ceil(occ/32))) via the bit-length identity
  // length(bin(q−1)), capped at the 16-plane family width). Holding
  // per-sub-bucket occupancy at ~32 reproduces the measured-good manual
  // settings — 7 bits at sf1 (r13 measured recall 1.0000 at 6) and
  // 10 bits at sf10 (r13's documented deployment value, 341 s → 13.1 s)
  // — at ANY scale without operator intervention. Because the oracle SQL
  // computes the identical integer derivation from the identical data,
  // the gate stays lockstep at every sf. Per-probe XOR masks are emitted
  // as Scala-computed BIGINT literals into the SQL (ADVICE r13: a
  // DuckDB-side `1 << j` would wrap at 32 bits while Scala's 1L<<j
  // doesn't — shared literals make overflow divergence impossible).
  private val KNN_BMAX = 16
  private val KNN_TARGET_OCC = 32
  private val knnTrianglesSampled: Q = (s, d) => {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < NCENTROIDS).toDF("c_id", "cv")
    val assigned = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("c_id"),
        round(Similarity.cosine(col("cv"), col("v")), 6).as("csim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("c_id").asc)))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cluster"))
    // bits is a driver-side SCALAR (the Zonal-radix/variogram-fit
    // precedent: the collect is inside the builder, so Bench times it):
    // mean codebook-cell occupancy occ = ceil(n / NCENTROIDS) needs only
    // the corpus row count (a parquet-metadata count — no assignment
    // materialization), and the plan is then built with EXACTLY `bits`
    // plane projections and static probe masks — the 16−bits dead planes
    // are never computed (a per-vector sum of live planes equals a
    // full-signature `& mask`, bit for bit). The oracle SQL derives the
    // same integer from the same count, so the gate stays lockstep at
    // every sf.
    val nRows = e.count()
    val q = ((nRows + NCENTROIDS - 1) / NCENTROIDS + KNN_TARGET_OCC - 1) / KNN_TARGET_OCC
    val bits =
      if (q <= 1L) 0
      else math.min(64 - java.lang.Long.numberOfLeadingZeros(q - 1), KNN_BMAX)
    val bktExpr =
      if (bits == 0) lit(0L)
      else (0 until bits).map { j =>
        val proj = round(Similarity.dot(col("v"), QueriesExt.planeCol(100 + j)), 6)
        when(proj > 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    // sig feeds the probe explode AND the bucket side of the join
    val sig = assigned.withColumn("bkt", bktExpr).persistShared()
    // probe j=0 is the vector's own sub-bucket (pmask 0); probes 1..bits
    // flip one live bit each (multiprobe LSH at Hamming distance 1)
    val probes = sig.select(col("vec_id"), col("v"), col("cluster"), col("bkt"),
        explode(array((0 to bits).map(j =>
          lit(if (j == 0) 0L else 1L << (j - 1))): _*)).as("pmask"))
      .select(col("vec_id"), col("v"), col("cluster"),
        col("bkt").bitwiseXOR(col("pmask")).as("pb"))
    val r = sig.select(col("vec_id").as("r_vec_id"), col("v").as("r_v"),
      col("cluster").as("r_cluster"), col("bkt").as("r_bkt"))
    // candidates: same cluster, bucket within Hamming 1; the narrow
    // (id, id, sim) projection feeds both the count and the rank window
    val cand = probes.join(r,
        col("cluster") === col("r_cluster") && col("pb") === col("r_bkt") &&
          col("vec_id") =!= col("r_vec_id"))
      .select(col("vec_id"), col("r_vec_id"),
        round(Similarity.cosine(col("v"), col("r_v")), 6).as("sim"))
      .persistShared()
    val nCand = cand.agg(count(lit(1)).as("n_cand_pairs"))
    val knn = cand.withColumn("rank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("r_vec_id").asc)))
      .filter(col("rank") <= KNN_K)
    val edges = knn.select(least(col("vec_id"), col("r_vec_id")).as("a"),
        greatest(col("vec_id"), col("r_vec_id")).as("b"))
      .distinct().persistShared()
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val wedges = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .agg(sum((col("deg") * (col("deg") - 1) / lit(2)).cast("long"))
        .as("n_wedges"))
    val tri = edges
      .join(edges.toDF("b", "c"), "b")
      .join(edges.toDF("a", "c"), Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    nCand.crossJoin(nEdges).crossJoin(wedges).crossJoin(tri)
      .select(col("n_cand_pairs"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0)).otherwise(
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("global_cc"))
  }

  private val knnTrianglesSampledSql = {
    val bktSql = (0 until KNN_BMAX).map { j =>
      val proj =
        s"round(list_dot_product(v, ${QueriesExt.planeSqlList(100 + j)}), 6)"
      s"(CASE WHEN $proj > 0.0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    // per-probe masks as Scala-computed BIGINT literals (shared constants
    // with the plan side — no engine-local shift arithmetic)
    val pmaskValues = (0 to KNN_BMAX).map(j =>
      s"($j, CAST(${if (j == 0) 0L else 1L << (j - 1)} AS BIGINT))")
      .mkString(", ")
    s"""WITH e AS ($embSqlCte),
        cents AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NCENTROIDS),
        assigned AS (
          SELECT vec_id, v, c_id AS cluster
          FROM (SELECT e.vec_id, e.v, c.c_id,
                       round(${Similarity.cosineSql("cv", "v")}, 6) AS csim
                FROM e, cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, c_id ASC) = 1),
        params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
        bitsq AS (SELECT CASE WHEN q <= 1 THEN 0
                              ELSE least(length(bin(q - 1)), $KNN_BMAX)
                         END AS bits
                  FROM (SELECT (((n + $NCENTROIDS - 1) // $NCENTROIDS)
                               + ${KNN_TARGET_OCC - 1})
                               // $KNN_TARGET_OCC AS q FROM params)),
        maskq AS (SELECT bits, (CAST(1 AS BIGINT) << bits) - 1 AS mask
                  FROM bitsq),
        sig AS (SELECT vec_id, v, cluster, bits, ($bktSql) & mask AS bkt
                FROM assigned, maskq),
        probes AS (SELECT vec_id, v, cluster, xor(bkt, pmask) AS pb
                   FROM sig, (VALUES $pmaskValues) pm(j, pmask)
                   WHERE pm.j <= sig.bits),
        cand AS (SELECT p.vec_id, r.vec_id AS r_vec_id,
                        round(${Similarity.cosineSql("p.v", "r.v")}, 6) AS sim
                 FROM probes p JOIN sig r
                   ON p.cluster = r.cluster AND p.pb = r.bkt
                  AND p.vec_id <> r.vec_id),
        nc AS (SELECT count(*) AS n_cand_pairs FROM cand),
        knn AS (SELECT vec_id, r_vec_id FROM cand
                QUALIFY row_number() OVER (PARTITION BY vec_id
                  ORDER BY sim DESC, r_vec_id ASC) <= $KNN_K),
        edges AS (SELECT DISTINCT least(vec_id, r_vec_id) AS a,
                         greatest(vec_id, r_vec_id) AS b FROM knn),
        deg AS (SELECT n, count(*) AS deg
                FROM (SELECT a AS n FROM edges
                      UNION ALL SELECT b AS n FROM edges) GROUP BY 1),
        w AS (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
              FROM deg),
        t AS (SELECT count(*) AS n_triangles
              FROM edges e1 JOIN edges e2 ON e2.a = e1.b
                            JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
        c AS (SELECT count(*) AS n_edges FROM edges)
        SELECT n_cand_pairs, n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges = 0 THEN 0.0
                    ELSE round(3.0 * n_triangles / n_wedges, 6) END AS global_cc
        FROM nc, c, w, t"""
  }

  // ---- n_pca_power: top principal direction by one power iteration -----
  // Embedding-hygiene op (anisotropy / rogue-dimension check before ANN
  // or semantic dedup): the Gram matrix G[i,j] = Σ_rows q(vᵢ·vⱼ) is ONE
  // distributed aggregate over per-row quantized products (1e-5 integer
  // cents — merge-order-exact, the engine's standard trick), then a
  // power step from the all-ones seed runs on the 64×64 matrix:
  // u1 = G·1 (exact ints), normalize to ≤1e5 via a deterministic
  // double floor, u2 = G·u1n (exact ints again — every product bounded
  // well under 2^63 at any corpus size because u1n is re-normalized).
  // Output: top-5 dimensions by |loading| with the loading ratio —
  // sign pinned by the ones seed, ties by dim. Scale shape: the only
  // corpus-sized work is the D² explode feeding one hash aggregate
  // (map-side partial sums shrink it to D² rows per partition); all
  // matrix work after that is on 4096 rows regardless of corpus size.
  private val PCA_Q = 100000L // per-row product quantizer (1e-5)
  private val pcaPower: Q = (s, d) => {
    val e = emb(s, d)
    // JIT-modality verdict (VERDICT r13 #4 — root-caused round 14): this
    // nested-generate Gram stage is the suite's one JIT-bimodal plan —
    // identical code/plan reads 1.4–1.9 s in some JVMs and 2.1–2.8 s in
    // others, the mode FROZEN at the moment C2 first compiles the
    // generated stage (runs 2–3 inside one JVM never converge, so no
    // warm-up can re-roll the die). Tier pinning proves the mechanism:
    // C1-only reads 4.9 s stable, C2-only 3.7 s — the fast mode needs
    // tiered PROFILE-GUIDED C2, and whether C2 sees a mature C1 profile
    // is compile-queue timing luck on a stage that only executes 1–2
    // times per JVM. Alternative formulations all measured SLOWER in
    // every mode: single-generator HOF outer product 4.6 s (interpreted
    // lambdas + 4096-element allocation per row), upper-triangle +
    // mirror-union 4.2–4.5 s (the filter/slice breaks the tight generate
    // loop and the saved multiplies don't pay for it). The nested
    // explode stays — fastest in BOTH its modes, spread 1.47× (inside
    // the 1.5× tripwire), annotated known-bimodal in the verify skill.
    val prod = e
      .select(col("v"), posexplode(col("v")))
      .toDF("v", "i0", "vi")
      .select((col("i0") + 1).as("i"), col("vi"), posexplode(col("v")))
      .toDF("i", "vi", "j0", "vj")
      .select(col("i"), (col("j0") + 1).as("j"),
        expr(s"CAST(floor(vi * vj * $PCA_Q + 0.5) AS BIGINT)").as("q"))
    val g = prod.groupBy("i", "j").agg(sum("q").as("cq")).persistShared()
    val u1 = g.groupBy("i").agg(sum("cq").as("u1"))
    val um = u1.agg(max(abs(col("u1"))).as("um"))
    val u1n = u1.crossJoin(broadcast(um))
      .select(col("i").as("j"),
        expr(s"CAST(floor(CAST(u1 AS DOUBLE) * $PCA_Q / um) AS BIGINT)")
          .as("u1n"))
    val u2 = g.join(broadcast(u1n), "j")
      .groupBy("i").agg(sum(col("cq") * col("u1n")).as("u2"))
    val m2 = u2.agg(max(abs(col("u2"))).as("m2"))
    u2.crossJoin(broadcast(m2))
      .orderBy(abs(col("u2")).desc, col("i").asc).limit(5)
      .select(
        row_number().over(Window.orderBy(abs(col("u2")).desc, col("i").asc))
          .as("rank"),
        col("i").cast("long").as("dim"),
        round(col("u2").cast("double") / col("m2"), 6).as("loading"))
  }

  private val pcaPowerSql =
    s"""WITH e AS ($embSqlCte),
        g AS (SELECT i, j,
                     CAST(sum(CAST(floor(v[i] * v[j] * $PCA_Q + 0.5) AS BIGINT))
                       AS BIGINT) AS cq
              FROM e, range(1, 65) t1(i), range(1, 65) t2(j)
              GROUP BY 1, 2),
        u1 AS (SELECT i, CAST(sum(cq) AS BIGINT) AS u1 FROM g GROUP BY 1),
        um AS (SELECT max(abs(u1)) AS um FROM u1),
        u1n AS (SELECT i AS j,
                       CAST(floor(CAST(u1 AS DOUBLE) * $PCA_Q
                                  / (SELECT um FROM um)) AS BIGINT) AS u1n
                FROM u1),
        u2 AS (SELECT g.i, CAST(sum(g.cq * u.u1n) AS BIGINT) AS u2
               FROM g JOIN u1n u ON u.j = g.j GROUP BY 1),
        m2 AS (SELECT max(abs(u2)) AS m2 FROM u2)
        SELECT CAST(row_number() OVER (ORDER BY abs(u2) DESC, i ASC) AS INT)
                 AS rank,
               i AS dim,
               round(CAST(u2 AS DOUBLE) / (SELECT m2 FROM m2), 6) AS loading
        FROM u2 ORDER BY abs(u2) DESC, i ASC LIMIT 5"""

  val queries: Map[String, Q] = Map(
    "n_pca_power" -> pcaPower,
    "g_knn_triangles" -> knnTriangles,
    "g_knn_triangles_sampled" -> knnTrianglesSampled,
    "x_semdedup" -> semdedup,
    "m_mrr" -> mrr,
    "n_matryoshka_recall" -> matryoshka,
    "n_inertia" -> inertia,
    "n_sq8_topk" -> sq8Topk,
    "m_ndcg" -> ndcg,
    "n_pq_adc" -> pqAdc,
    "n_cosine_topk" -> cosineTopk,
    "x_dedup_embcos" -> dedupEmbcos,
    "n_ivf_topk" -> ivfTopk,
    "n_ivf_multiprobe" -> ivfMultiprobe,
    "n_emb_stats" -> embStats,
    "n_kmeans_step" -> kmeansStep,
    "n_ivfpq_topk" -> ivfpqTopk,
  )

  val oracle: Map[String, String] = Map(
    "n_pca_power" -> pcaPowerSql,
    "g_knn_triangles" -> knnTrianglesSql,
    "g_knn_triangles_sampled" -> knnTrianglesSampledSql,
    "x_semdedup" -> semdedupSql,
    "m_mrr" -> mrrSql,
    "n_matryoshka_recall" -> matryoshkaSql,
    "n_inertia" -> inertiaSql,
    "n_sq8_topk" -> sq8TopkSql,
    "m_ndcg" -> ndcgSql,
    "n_pq_adc" -> pqAdcSql,
    "n_cosine_topk" -> cosineTopkSql,
    "x_dedup_embcos" -> dedupEmbcosSql,
    "n_ivf_topk" -> ivfTopkSql,
    "n_ivf_multiprobe" -> ivfMultiprobeSql,
    "n_emb_stats" -> embStatsSql,
    "n_kmeans_step" -> kmeansStepSql,
    "n_ivfpq_topk" -> ivfpqTopkSql,
  )
}
