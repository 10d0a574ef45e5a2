package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric array columns.
  *
  * Semantics: left-to-right fold of element products in double — EXACTLY
  * the values of `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  * 0D, (acc,v) -> acc+v)` (and of DuckDB's `list_sum(list_transform(...))`
  * oracle), but compiled into a tight loop by whole-stage codegen instead
  * of interpreted higher-order-function evaluation. float→double widening
  * is exact, so the result is bit-identical to the HOF formulation.
  *
  * Length mismatch takes the common prefix; null elements are treated as
  * 0 (the embedding corpus has none — documented divergence from the HOF
  * null-propagation).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a  = l.asInstanceOf[ArrayData]
    val b  = r.asInstanceOf[ArrayData]
    val n  = math.min(a.numElements(), b.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s  = 0.0
    var i  = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.isNullAt($i) ? 0.0 : (double) $a.$lGet($i);
         |  double y = $b.isNullAt($i) ? 0.0 : (double) $b.$rGet($i);
         |  $s += x * y;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
