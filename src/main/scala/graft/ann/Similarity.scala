package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * 100-TB ANN surface: brute-force cosine top-k as the exactness baseline,
  * IVF (centroid-bucketed) as the scale path. Dot products are pure
  * higher-order-function expressions (`zip_with` + `aggregate`), fully
  * codegen'd — no UDFs, no driver-side vectors.
  *
  * Scale design: brute force is a broadcast(queries)×candidates join —
  * fine for query batches. IVF turns search into an equi-join on the
  * cluster id: candidates are pre-assigned to their nearest centroid
  * (one broadcast pass), and each query probes only its own cluster, so
  * the per-query cost drops by the cluster count and the shuffle is a
  * plain hash partition on cluster id.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a left-fold — identical accumulation order everywhere. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def dotSql(a: String, b: String): String =
    s"list_dot_product($a, $b)"

  def norm(a: Column): Column = sqrt(dot(a, a))
  def normSql(a: String): String = s"sqrt(list_dot_product($a, $a))"

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"
}
