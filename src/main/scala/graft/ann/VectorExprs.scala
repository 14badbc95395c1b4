package graft.ann

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen vector kernels (SURVEY.md §2.11 preference order: a
  * Catalyst `Expression` with `doGenCode` beats higher-order functions).
  *
  * The HOF spelling `aggregate(zip_with(a, b, _*_), 0.0, _+_)` materializes
  * the product array and walks lambda closures per element; these loop over
  * the two `ArrayData` buffers directly inside the generated stage — same
  * left-fold accumulation ORDER, so results are bit-identical to the HOF
  * form (and to DuckDB's sequential `list_dot_product`), and the oracle
  * gate stays green with no tolerance.
  *
  * Robustness contract:
  * - both expressions enforce `array<double>` inputs via
  *   checkInputDataTypes, so constructing one directly on an
  *   `array<float>` (or non-array) column fails analysis instead of
  *   `getDouble` silently reading garbage; Similarity.dot/cosine cast
  *   at the Column level before construction;
  * - mismatched lengths yield NULL (the HOF spelling's behavior via
  *   zip_with's null padding) rather than a silently truncated value —
  *   a short/corrupt vector surfaces as a null similarity, not a
  *   plausible number;
  * - element nulls are not handled (embedding vectors are dense by
  *   schema contract); a null ARRAY yields null via the nullSafe
  *   wrappers.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** Cosine similarity in ONE pass: dot, ‖a‖², ‖b‖² accumulate in the same
  * loop, then `dot / (sqrt(na) * sqrt(nb))` — the exact arithmetic shape
  * of `dot(a,b) / (norm(a) * norm(b))`, so values match the three-pass
  * HOF spelling bit-for-bit while reading each vector once. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $x = $a.getDouble($i);
            final double $y = $b.getDouble($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** Shared analysis-time type gate for the vector kernels: both children
  * must already BE array<double> — no implicit widening here, because a
  * silent cast would hide a caller that skipped Similarity's documented
  * Column-level cast (the bug class this guard exists to surface). */
object VectorExprs {
  def requireDoubleArrays(
      name: String, left: Expression, right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires two array<double> inputs (cast via " +
            s"Similarity.dot/cosine), got ${l.catalogString} and ${r.catalogString}")
    }
}
