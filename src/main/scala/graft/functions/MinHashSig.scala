package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: `graft_minhash_sig(sh, aLits, bLits)` →
  * the n affine-rehash minima `min_h(h·a_i + b_i)` of an
  * `array<long>` hashed-shingle set against FOLDABLE coefficient
  * arrays — the universal-hash family MLlib's MinHashLSH uses.
  *
  * The builtin composition (n × `array_min(transform(sh, h ->
  * h*a+b))`) is semantically identical but makes n interpreted
  * higher-order passes over every shingle array — and the signature
  * pass is the one full-corpus scan of the MinHash dedup path (batch
  * dedupMinhash AND the streaming LSH index build), exactly where
  * interpreted eval multiplies by 100 TB. This expression computes
  * all n minima in ONE fused pass per row (shingle-outer loop, the
  * cache-friendly order) inside whole-stage codegen.
  *
  * Long arithmetic wraps exactly like the builtin Multiply/Add with
  * ANSI off (deliberate overflow — the family needs it), null
  * shingle entries are skipped exactly as `array_min` skips the
  * nulls `transform` propagates, and an empty/all-null set yields
  * all-null elements — bit-for-bit the builtin result, which
  * GraftFunctionsSpec asserts code-for-code over the corpus. */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_minhash_sig requires foldable (literal) coefficient arrays")
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig requires three array<bigint> arguments, " +
          s"got ${f.sql}, ${s.sql} and ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val (aCoef, bCoef) = {
    def flat(e: Expression): Array[Long] = {
      val d = e.eval(null).asInstanceOf[ArrayData]
      val out = new Array[Long](d.numElements())
      var i = 0
      while (i < out.length) { out(i) = d.getLong(i); i += 1 }
      out
    }
    val a = flat(second)
    val b = flat(third)
    require(a.length == b.length,
      s"coefficient arrays differ in length: ${a.length} vs ${b.length}")
    (a, b)
  }

  override protected def nullSafeEval(sh: Any, a: Any, b: Any): Any =
    MinHashSig.sig(sh.asInstanceOf[ArrayData], aCoef, bCoef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, _, _) => {
      val aRef = ctx.addReferenceObj("mhA", aCoef, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bCoef, "long[]")
      s"${ev.value} = graft.functions.MinHashSig.sig($sh, $aRef, $bRef);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinHashSig {
  /** One fused pass: for each non-null shingle hash, update all n
    * running minima. Called from generated code — primitive loops,
    * no allocation beyond the n-long result. */
  def sig(sh: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = a.length
    val m = sh.numElements()
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < m) {
      if (!sh.isNullAt(j)) {
        any = true
        val h = sh.getLong(j)
        var i = 0
        while (i < n) {
          val v = h * a(i) + b(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (any) new GenericArrayData(mins)
    else new GenericArrayData(new Array[Any](n)) // all-null elements, as array_min(empty)
  }
}
