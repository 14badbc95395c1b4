package graft.ann

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  * - construction goes through Similarity.dot/cosine, which cast both
  *   sides to array<double> at the Column level, so a raw `array<float>`
  *   embedding column is widened instead of being reinterpreted
  *   byte-wise by `getDouble` (silent garbage) — do not build these
  *   expressions directly on un-cast inputs;
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
