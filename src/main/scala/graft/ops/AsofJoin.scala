package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: attach to every left row the single latest right row whose
  * `ts` ≤ the left row's `ts`, per join `key` (left-join semantics — left
  * rows with no earlier right row keep nulls). The reference's nearest
  * analog is the regrid as-of alignment (differencing_functions.py:
  * 2102–2106); the general operator is declared an engine extension.
  *
  * Spark has no ASOF JOIN operator. A naive re-expression is a range join
  * (`l.ts >= r.ts`) + argmax — Catalyst plans that as a broadcast
  * nested-loop or cartesian product, O(|L|·|R|) at scale. This is the
  * one-shuffle form instead:
  *
  *   1. tag both sides and UNION them into one relation,
  *   2. hash-partition by `key`, sort each partition by (ts, side) —
  *      right rows sort BEFORE left rows at equal ts, giving the
  *      inclusive `r.ts <= l.ts` match,
  *   3. carry the most recent right payload forward with a running
  *      `last(_, ignoreNulls)` frame, and keep the left rows.
  *
  * Cost: ONE exchange of |L|+|R| rows on `key` and a per-partition sort —
  * no pair explosion, no driver involvement, AQE-skew-splittable. The
  * payload travels as a single struct so all right columns stay from the
  * same matched row.
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate if not
  * (equal-ts duplicates would make ASOF nondeterministic in any engine).
  */
object AsofJoin {

  /** Internal working columns; a caller column with one of these names
    * (or a left column shadowing a right payload name) would silently
    * produce wrong matches, so both entry points reject the collision
    * up front instead. */
  private val reserved = Set("_side", "_r", "_b", "_f", "_m")

  private def checkColumns(left: DataFrame, right: DataFrame, key: String,
                           ts: String, payload: Seq[String]): Unit = {
    require(payload.nonEmpty, "asof needs at least one right payload column")
    val clash = (left.columns ++ right.columns).filter(reserved).distinct
    require(clash.isEmpty,
      s"asof reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")
  }

  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String]): DataFrame = {
    checkColumns(left, right, key, ts, payload)
    val rStruct = struct((ts +: payload).map(col): _*)
    val rNull = lit(null).cast(
      right.select(rStruct).schema.head.dataType)
    val l = left.withColumn("_side", lit(1)).withColumn("_r", rNull)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("_side"), rStruct.as("_r")) ++
        left.columns.filterNot(Set(key, ts))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        Seq(col(s"_m.$ts").as(s"asof_$ts")) ++
        payload.map(c => col(s"_m.$c").as(s"asof_$c")): _*)
  }

  /** AS-OF join, direction = NEAREST (pandas merge_asof semantics):
    * attach the right row minimizing |l.ts − r.ts| per key; equal
    * distance resolves BACKWARD (the earlier right row). Same
    * one-shuffle union form as [[asof]], with one extra window over the
    * SAME sort: the backward candidate is the running `last` right
    * payload, the forward candidate the running `first` over the
    * following frame (right rows at equal ts sort before left rows, so
    * the forward frame is strictly-after and an equal-ts match arrives
    * via the inclusive backward side with distance 0). Still exactly ONE
    * exchange + one per-partition sort — both windows share them.
    *
    * Contract: `ts` must be NUMERIC (e.g. unix micros) — the pick
    * compares distances by subtraction. `right` unique per (key, ts). */
  def asofNearest(left: DataFrame, right: DataFrame, key: String, ts: String,
                  payload: Seq[String]): DataFrame = {
    checkColumns(left, right, key, ts, payload)
    val rStruct = struct((ts +: payload).map(col): _*)
    val rNull = lit(null).cast(
      right.select(rStruct).schema.head.dataType)
    val l = left.withColumn("_side", lit(1)).withColumn("_r", rNull)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("_side"), rStruct.as("_r")) ++
        left.columns.filterNot(Set(key, ts))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val ord = Window.partitionBy(key).orderBy(col(ts).asc, col("_side").asc)
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pick = when(col("_b").isNull, col("_f"))
      .when(col("_f").isNull, col("_b"))
      .when(col(ts) - col(s"_b.$ts") <= col(s"_f.$ts") - col(ts), col("_b"))
      .otherwise(col("_f"))
    l.unionByName(r)
      .withColumn("_b", last(col("_r"), ignoreNulls = true).over(wB))
      .withColumn("_f", first(col("_r"), ignoreNulls = true).over(wF))
      .filter(col("_side") === 1)
      .withColumn("_m", pick)
      .select(left.columns.toIndexedSeq.map(col) ++
        Seq(col(s"_m.$ts").as(s"near_$ts")) ++
        payload.map(c => col(s"_m.$c").as(s"near_$c")): _*)
  }
}
