package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen multiset kernel for n-gram overlap metrics (the
  * SURVEY §2.11 preference order: a Catalyst `Expression` with
  * `doGenCode` beats exploding the grams into a corpus-sized shuffle).
  *
  * [[MultisetIntersectSize]] counts common elements WITH multiplicity
  * between two SORTED string arrays by a two-pointer merge walk —
  * Σ_g min(count_a(g), count_b(g)), exactly the quantity the
  * explode → groupBy → least(ch, cr) → sum plan computes, but in-row:
  * O(|a| + |b|) per row, zero shuffle. m_chrf's per-doc matched-gram
  * counts dropped 6.5 → ~1 s at sf0.1 when its gram explode was
  * replaced by this kernel against a broadcast reference array.
  *
  * Contract: inputs must be array<string> (analysis-time check) and
  * SORTED ascending (the caller wraps them in array_sort); element
  * nulls are not handled (gram arrays are dense by construction); a
  * null array yields null via the nullSafe wrappers.
  */
case class MultisetIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "multiset_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var m = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { m += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      s"""
        final int $na = $a.numElements();
        final int $nb = $b.numElements();
        int $i = 0; int $j = 0; long $m = 0L;
        while ($i < $na && $j < $nb) {
          final int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
          if ($c == 0) { $m++; $i++; $j++; }
          else if ($c < 0) { $i++; } else { $j++; }
        }
        ${ev.value} = $m;
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

object GramExprs {
  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Σ_g min(count_a(g), count_b(g)) over two SORTED array<string>
    * columns — the in-row form of the explode/groupBy/least/sum plan. */
  def multisetIntersectSize(a: Column, b: Column): Column =
    toCol(MultisetIntersectSize(toExpr(a), toExpr(b)))
}
