package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native SimHash: `graft_simhash64(toks)` → the 64-bit SimHash
  * signature of a token array, bit b = sign of Σ_tokens (±1 by bit b
  * of the token's 64-bit hash).
  *
  * The composition it replaces computed this as `explode(toks)` →
  * per-token md5/conv/substring → `groupBy(doc_id)` with 64
  * conditional sums: a ~100× row blowup followed by a full-corpus
  * SHUFFLE of 64-column partials — structural cost, not just
  * interpreted-eval overhead, and it multiplies by corpus size. This
  * expression folds the whole signature into ONE narrow map (no
  * explode, no shuffle): per token one MD5 digest and a 64-counter
  * update, inside whole-stage codegen.
  *
  * Bit-identical to the builtin chain (which GraftFunctionsSpec pins
  * code-for-code over the corpus):
  *  - per-token hash = md5 digest bytes 8..15 read big-endian — the
  *    exact value `shiftleft(conv(substring(hex,17,8),16,10),32) |
  *    conv(substring(hex,25,8),16,10)` assembles, and the one 64-bit
  *    hash DuckDB computes identically (the whole simhash query has
  *    a full SQL oracle because of it);
  *  - a null token falls through `when(...).otherwise(-1)` to −1 on
  *    every bit sum in the builtin — i.e. it contributes exactly as
  *    a hash of 0 does; replicated here;
  *  - bit set iff its sum is strictly positive. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(toks: Any): Any =
    SimHash64.sig(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      toks => s"${ev.value} = graft.functions.SimHash64.sig($toks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One narrow pass: per token, MD5 of the UTF-8 bytes, take digest
    * bytes 8..15 big-endian, ±1 each of the 64 bit counters; emit
    * the majority-sign long. Called from generated code. */
  def sig(toks: ArrayData): Long = {
    val md = digests.get()
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      // null token ≡ hash 0 (the builtin's when/otherwise fallthrough):
      // bit b of 0 is never 1, so every counter decrements
      var h = 0L
      if (!toks.isNullAt(j)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(j).getBytes)
        h = ((d(8) & 0xFFL) << 56) | ((d(9) & 0xFFL) << 48) |
          ((d(10) & 0xFFL) << 40) | ((d(11) & 0xFFL) << 32) |
          ((d(12) & 0xFFL) << 24) | ((d(13) & 0xFFL) << 16) |
          ((d(14) & 0xFFL) << 8) | (d(15) & 0xFFL)
      }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
