package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native membership counter: `graft_count_in(toks, setLiteral)` →
  * how many tokens are in the FOLDABLE string set — the stopword
  * ratio's numerator in the corpus-wide quality scan.
  *
  * Replaces the interpreted `size(filter(toks, t =>
  * t.isInCollection(set)))` chain (lambda dispatch per token, a
  * filtered array materialized just to take its size): one fused
  * loop probing a hash set built once driver-side, inside
  * whole-stage codegen. Null tokens count as non-members, exactly as
  * the lambda's null predicate drops them; bit-identical counts
  * (GraftFunctionsSpec pins it over the corpus). Returns int, the
  * same type `size` produced. */
case class CountIn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_count_in requires a foldable (literal) membership set")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_count_in requires (array<string>, array<string>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_count_in"

  @transient private lazy val memberSet: java.util.HashSet[UTF8String] = {
    val d = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < d.numElements()) {
      if (!d.isNullAt(i)) s.add(d.getUTF8String(i))
      i += 1
    }
    s
  }

  override protected def nullSafeEval(toks: Any, set: Any): Any =
    CountIn.count(toks.asInstanceOf[ArrayData], memberSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) => {
      val setRef = ctx.addReferenceObj("memberSet", memberSet,
        "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
      s"${ev.value} = graft.functions.CountIn.count($toks, $setRef);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountIn {
  /** Fused probe loop — called from generated code. */
  def count(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
