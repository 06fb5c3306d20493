package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector scaling: `graft_vec_div(vec, s)` → the
  * `array<double>` with every element divided by the scalar — the
  * L2-normalization projection every ANN path runs over the whole
  * embedding corpus (embNormed / scoreQueries).
  *
  * The `transform(emb, x => x / nrm)` it replaces is an interpreted
  * higher-order function (lambda dispatch per element, a new
  * lambda-variable binding per row) sitting directly on the corpus
  * scan side of every vector query. This is one fused primitive loop
  * inside whole-stage codegen. Bit-identical: the same IEEE double
  * division per element in the same order, null elements preserved
  * as nulls — GraftFunctionsSpec pins it code-for-code over the
  * corpus. */
case class VecDiv(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_vec_div requires (array<double>, double), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = left.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "graft_vec_div"

  override protected def nullSafeEval(vec: Any, s: Any): Any =
    VecDiv.div(vec.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (vec, s) => s"${ev.value} = graft.functions.VecDiv.div($vec, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDiv {
  /** Fused elementwise divide — called from generated code. Null
    * elements stay null (as the lambda's null-propagating divide). */
  def div(vec: ArrayData, s: Double): ArrayData = {
    val n = vec.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Double](n)
      var j = 0
      while (j < n) { out(j) = vec.getDouble(j) / s; j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        out(j) = if (vec.isNullAt(j)) null
        else java.lang.Double.valueOf(vec.getDouble(j) / s)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
