package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Catalyst expression: set Jaccard similarity of two string
  * arrays — |A ∩ B| / |A ∪ B| with set semantics (duplicate elements
  * collapse, exactly like `size(array_intersect) / size(array_union)`
  * and DuckDB's distinct-list formulation, including NaN for two
  * empty sets via double division).
  *
  * Why an Expression: the dedup verify stages run this per candidate
  * pair; the HOF formulation walks both arrays four times through
  * interpreted array_intersect/array_union allocations, where this is
  * two hash-set builds and one membership sweep inlined into
  * whole-stage codegen (SURVEY §4.2 preference order (b)).
  *
  * Null elements are not expected (shingle arrays never contain
  * null) and are skipped if present.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_similarity expects array<string> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val sa = new java.util.HashSet[AnyRef]()
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) sa.add(x.getUTF8String(i))
      i += 1
    }
    val sb = new java.util.HashSet[AnyRef]()
    i = 0
    while (i < y.numElements()) {
      if (!y.isNullAt(i)) sb.add(y.getUTF8String(i))
      i += 1
    }
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    val union = sa.size() + sb.size() - inter
    inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val it = ctx.freshName("it")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      // raw types: Janino's generics support is limited
      s"""
        java.util.HashSet $sa = new java.util.HashSet();
        for (int $i = 0; $i < $a.numElements(); $i++) {
          if (!$a.isNullAt($i)) $sa.add($a.getUTF8String($i));
        }
        java.util.HashSet $sb = new java.util.HashSet();
        for (int $i = 0; $i < $b.numElements(); $i++) {
          if (!$b.isNullAt($i)) $sb.add($b.getUTF8String($i));
        }
        int $inter = 0;
        java.util.Iterator $it = $sb.iterator();
        while ($it.hasNext()) {
          if ($sa.contains($it.next())) $inter++;
        }
        int $union = $sa.size() + $sb.size() - $inter;
        ${ev.value} = (double) $inter / (double) $union;
      """
    })
  }

  override def prettyName: String = "jaccard_similarity"
}

object JaccardSimilarity {
  /** Column builder over the native expression. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
