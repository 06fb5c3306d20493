package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-grams: `graft_char_ngrams(t, n)` → every
  * n-char window of the text in order (code-point windows, as
  * `substr` slices), with fewer than n chars yielding the whole text
  * as a single gram — the trigram stream behind language ID's
  * corpus-wide profile training and scoring. `n` must be foldable.
  *
  * Replaces the interpreted `when(length >= n, transform(sequence(
  * ...), i => substr(i, n))).otherwise(array(t))` chain: one pass
  * computing code-point offsets in place and slicing each window's
  * byte range directly, inside whole-stage codegen — bit-identical
  * strings (GraftFunctionsSpec pins it over the corpus). */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_char_ngrams requires a foldable (literal) n")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_char_ngrams requires (string, int), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_char_ngrams"

  @transient private lazy val n: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v >= 1, s"graft_char_ngrams needs n >= 1, got $v")
    v
  }

  override protected def nullSafeEval(t: Any, nAny: Any): Any =
    CharNgrams.grams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (t, _) => s"${ev.value} = graft.functions.CharNgrams.grams($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharNgrams {
  /** One pass: code-point offsets, then each gram is a byte-range
    * slice. Called from generated code. */
  def grams(t: UTF8String, n: Int): ArrayData = {
    val nChars = t.numChars()
    if (nChars < n) return new GenericArrayData(Array[Any](t))
    val bytes = t.getBytes
    val offsets = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (c < nChars) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(nChars) = bytes.length
    val out = new Array[Any](nChars - n + 1)
    var i = 0
    while (i + n <= nChars) {
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offsets(i), offsets(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
