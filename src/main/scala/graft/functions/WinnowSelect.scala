package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing selector: `graft_winnow_sel(t, k, w)` → the
  * sorted distinct set of selected gram hashes (Schleimer et al.,
  * MOSS) of a text: md5 each k-char gram, select the minimum of
  * every w-gram window, return the distinct selections ascending —
  * as lowercase hex strings, the form the DuckDB-oracle'd
  * `t_winnow` digest is built from. `k`/`w` must be foldable.
  *
  * The builtin composition it replaces materialized EVERY k-char
  * gram as a string, then every md5 as a 32-char hex string, then
  * ran two more interpreted passes (window `array_min(slice(...))`,
  * `array_distinct` + `array_sort`) — four interpreted higher-order
  * passes and ~33× text-size of transient strings per document, on
  * a fingerprint scan meant to run over every document in a corpus.
  * This expression walks the UTF-8 bytes once (code-point offsets
  * computed in place — `substr` is code-point based, so grams are
  * char windows, not byte windows), digests each gram's byte range
  * directly, selects window minima as 16-byte digests, and renders
  * hex only for the final selected set.
  *
  * Bit-identical to the builtin on its production domain (inputs
  * pre-filtered to length ≥ k): unsigned digest-byte order IS the
  * lexicographic order of lowercase-hex md5 strings (same length,
  * hex digits ordered by nibble value), and the < w-window fallback
  * (one global minimum) is folded in. GraftFunctionsSpec pins the
  * equality code-for-code over the corpus. */
case class WinnowSelect(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_winnow_sel requires foldable (literal) k and w")
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow_sel requires (string, int, int), got ${f.sql}, ${s.sql} and ${t.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_winnow_sel"

  @transient private lazy val (kGram, wWin) = {
    val k = second.eval(null).asInstanceOf[Int]
    val w = third.eval(null).asInstanceOf[Int]
    require(k >= 1 && w >= 1, s"graft_winnow_sel needs k, w >= 1, got k=$k w=$w")
    (k, w)
  }

  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any =
    WinnowSelect.select(t.asInstanceOf[UTF8String], kGram, wWin)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = graft.functions.WinnowSelect.select($t, $kGram, $wWin);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowSelect {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte order over md5 digests == lexicographic order of
    * their lowercase-hex renderings. */
  private val DigestOrder = new java.util.Comparator[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < 16) {
        val c = (a(i) & 0xFF) - (b(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  /** One pass over the UTF-8 bytes: code-point offsets in place, one
    * MD5 per k-char gram's byte range, window minima as raw digests,
    * distinct+sort via one ordered set, hex rendered only for the
    * selected few. Called from generated code. */
  def select(t: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = t.getBytes
    val nChars = t.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    // offsets(c) = byte offset of char c; offsets(nChars) = length
    val offsets = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (c < nChars) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(nChars) = bytes.length

    val md = digests.get()
    val nGrams = nChars - k + 1
    val hashes = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      hashes(i) = md.digest()
      i += 1
    }

    val selected = new java.util.TreeSet[Array[Byte]](DigestOrder)
    if (nGrams < w) {
      // the builtin's fallback: one global minimum
      var min = hashes(0)
      var j = 1
      while (j < nGrams) {
        if (DigestOrder.compare(hashes(j), min) < 0) min = hashes(j)
        j += 1
      }
      selected.add(min)
    } else {
      var s = 0
      while (s + w <= nGrams) {
        var min = hashes(s)
        var j = s + 1
        while (j < s + w) {
          if (DigestOrder.compare(hashes(j), min) < 0) min = hashes(j)
          j += 1
        }
        selected.add(min)
        s += 1
      }
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = hex(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}
