package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ encoder: `graft_pq_encode(vec, bookLiteral)` → the m
  * nearest-sub-centroid codes of an `array<double>` vector against a
  * FOLDABLE m×k×sub codebook literal.
  *
  * The builtin-composed form (per subspace: `zip_with` the codebook
  * with its norms, an `aggregate`-lambda dot per centroid,
  * `array_position(array_max)`) is semantically identical but
  * higher-order functions are interpreted — no whole-stage codegen —
  * and the encode is the ONE full-corpus pass of every PQ path
  * (annPqTopk, VectorIndex.buildPq/buildIvfPq), exactly where
  * interpreted expression eval multiplies by 100 TB. This expression
  * flattens the codebook ONCE driver-side (flat array + precomputed
  * |c|², both shipped as codegen reference objects) and each row is
  * one static-helper call of fused primitive loops — small generated
  * code (the k-separate-dots form overflowed the 64KB method limit),
  * JIT-friendly, inside whole-stage codegen.
  *
  * Scoring is argmax of 2·x·c − |c|² (|x|² constant per subspace);
  * ties keep the LOWEST centroid index — bit-identical to the
  * builtin form it replaces (same FP accumulation order), which
  * GraftFunctionsSpec asserts code-for-code over the corpus. */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_pq_encode requires a foldable (literal) codebook")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires (array<double>, array<array<array<double>>>), " +
        s"got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  // the codebook literal, flattened once: book((mm*k + kk)*sub + i)
  // and norms2(mm*k + kk); norms accumulate in the same sequential
  // order as the builtin form's c.map(x*x).sum for bit-identity
  @transient private lazy val (flatBook, norms2, mDim, kDim, subDim) = {
    val bookData = right.eval(null).asInstanceOf[ArrayData]
    val m = bookData.numElements()
    val first = bookData.getArray(0)
    val k = first.numElements()
    val sub = first.getArray(0).numElements()
    val flat = new Array[Double](m * k * sub)
    val n2 = new Array[Double](m * k)
    var mm = 0
    while (mm < m) {
      val cells = bookData.getArray(mm)
      var kk = 0
      while (kk < k) {
        val c = cells.getArray(kk)
        var s = 0.0
        var i = 0
        while (i < sub) {
          val x = c.getDouble(i)
          flat((mm * k + kk) * sub + i) = x
          s += x * x
          i += 1
        }
        n2(mm * k + kk) = s
        kk += 1
      }
      mm += 1
    }
    (flat, n2, m, k, sub)
  }

  override protected def nullSafeEval(v: Any, book: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], flatBook, norms2, mDim, kDim, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val bookRef = ctx.addReferenceObj("pqBook", flatBook, "double[]")
      val n2Ref = ctx.addReferenceObj("pqNorms2", norms2, "double[]")
      s"${ev.value} = graft.functions.PqEncode.encode(" +
        s"$v, $bookRef, $n2Ref, $mDim, $kDim, $subDim);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Fused encode loops — called from generated code (one virtual
    * call per row; primitive arrays, no allocation beyond the m-int
    * result). First-max tie-breaking == `array_position(array_max)`. */
  def encode(v: ArrayData, book: Array[Double], norms2: Array[Double],
      m: Int, k: Int, sub: Int): ArrayData = {
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var kk = 0
      while (kk < k) {
        var dot = 0.0
        val base = (mm * k + kk) * sub
        var i = 0
        while (i < sub) { dot += v.getDouble(mm * sub + i) * book(base + i); i += 1 }
        val score = dot * 2 - norms2(mm * k + kk)
        if (score > bestScore) { bestScore = score; best = kk }
        kk += 1
      }
      codes(mm) = best
      mm += 1
    }
    new GenericArrayData(codes)
  }
}
