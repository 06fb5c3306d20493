package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native n-gram hasher: `graft_ngram_hash(toks, n)` → the xxhash64
  * of every n-token window (space-joined), one element per position
  * in order, duplicates kept — the per-position gram stream behind
  * decontamination (batch AND streaming), repetition stats, and the
  * exact-substring span dedup. `n` must be foldable.
  *
  * Replaces the interpreted `transform(sequence(...), i =>
  * xxhash64(concat_ws(" ", slice(w, i, n))))` composition on those
  * full-corpus scans: one fused pass per row inside whole-stage
  * codegen, using the same `hashUTF8String(_, 42)` primitive the
  * builtin `xxhash64` calls and concat_ws's null-skipping join —
  * bit-identical element for element (GraftFunctionsSpec pins it),
  * so exploded/counted/joined downstreams and their DuckDB oracles
  * are unchanged. Fewer than n tokens → empty array, the
  * `when(size >= n, ...).otherwise(empty)` guard folded in.
  *
  * The distinct-set variant for MinHash shingles is Shingle3Hash
  * (first-occurrence dedupe belongs inside its fused pass); this one
  * keeps every position because its callers count occurrences. */
case class NgramHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_ngram_hash requires a foldable (literal) n")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_hash requires (array<string>, int), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_ngram_hash"

  @transient private lazy val n: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v >= 1, s"graft_ngram_hash needs n >= 1, got $v")
    v
  }

  override protected def nullSafeEval(toks: Any, nAny: Any): Any =
    NgramHash.hashes(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (toks, _) => s"${ev.value} = graft.functions.NgramHash.hashes($toks, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramHash {
  private val Sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val Seed = 42L // xxhash64's fixed default seed

  /** One fused pass: per position, join n tokens with single spaces
    * (nulls skipped, as concat_ws does) and XXH64 the bytes. Called
    * from generated code. */
  def hashes(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i + n <= len) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      val g = org.apache.spark.unsafe.types.UTF8String.concatWs(Sep, window: _*)
      out(i) = XXH64.hashUTF8String(g, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}
