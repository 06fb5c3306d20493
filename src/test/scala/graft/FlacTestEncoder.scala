package graft

import graft.multimodal.Flac

/** Minimal FLAC ENCODER for fixtures — written from the published
  * format (RFC 9639) independently of the decoder so a round-trip
  * exercises both directions of every construct: subframe types
  * (constant / verbatim / fixed 0-4 / LPC), rice partitions and the
  * raw-bits escape, wasted bits, all four channel assignments, short
  * last frames. The CRC polynomials are known-answer-tested in
  * FlacSpec, so encoder/decoder symmetry cannot mask a wrong CRC. */
object FlacTestEncoder {

  sealed trait Mode
  case object Constant extends Mode
  case object Verbatim extends Mode
  final case class Fixed(order: Int) extends Mode
  /** LPC with explicit quantized coefficients and shift. */
  final case class Lpc(coefs: Seq[Long], shift: Int, precision: Int) extends Mode

  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
    }
    def writeBits(n: Int, v: Long): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (nbits != 0) writeBit(0)
    def bytesSoFar: Array[Byte] = {
      require(nbits == 0, "not byte-aligned"); buf.toByteArray
    }
  }

  /** Encode per-channel sample arrays into a native FLAC stream.
    * `stereo`: independent | leftside | rightside | midside (the
    * latter three require exactly 2 channels). `mode` picks the
    * subframe type per (frame, channel). */
  def encode(channels: Array[Array[Long]], bps: Int, blockSize: Int,
      sampleRate: Int = 44100,
      stereo: String = "independent",
      mode: (Int, Int) => Mode = (_, _) => Fixed(2),
      partOrder: Int = 0,
      escape: Boolean = false,
      wasted: Int = 0,
      riceMethod: Int = 0): Array[Byte] = {
    val nCh = channels.length
    val total = channels(0).length.toLong
    require(channels.forall(_.length == total))
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, marked last metadata block
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new BitWriter
    si.writeBits(16, blockSize); si.writeBits(16, blockSize)
    si.writeBits(24, 0); si.writeBits(24, 0)
    si.writeBits(20, sampleRate)
    si.writeBits(3, nCh - 1)
    si.writeBits(5, bps - 1)
    si.writeBits(36, total)
    (0 until 16).foreach(_ => si.writeBits(8, 0)) // md5 unset
    out.write(si.bytesSoFar)

    var pos = 0
    var frameIdx = 0
    while (pos < total) {
      val n = math.min(blockSize, (total - pos).toInt)
      val slice = channels.map(_.slice(pos, pos + n))
      out.write(encodeFrame(slice, bps, n, frameIdx, stereo, mode, partOrder,
        escape, wasted, riceMethod))
      pos += n
      frameIdx += 1
    }
    out.toByteArray
  }

  private def encodeFrame(chans: Array[Array[Long]], bps: Int, n: Int,
      frameIdx: Int, stereo: String, mode: (Int, Int) => Mode,
      partOrder: Int, escape: Boolean, wasted: Int, riceMethod: Int): Array[Byte] = {
    val nCh = chans.length
    val (asgn, stored): (Int, Array[Array[Long]]) = stereo match {
      case "independent" => (nCh - 1, chans)
      case "leftside" =>
        require(nCh == 2)
        (8, Array(chans(0), Array.tabulate(n)(i => chans(0)(i) - chans(1)(i))))
      case "rightside" =>
        require(nCh == 2)
        (9, Array(Array.tabulate(n)(i => chans(0)(i) - chans(1)(i)), chans(1)))
      case "midside" =>
        require(nCh == 2)
        (10, Array(Array.tabulate(n)(i => (chans(0)(i) + chans(1)(i)) >> 1),
          Array.tabulate(n)(i => chans(0)(i) - chans(1)(i))))
    }
    val w = new BitWriter
    w.writeBits(14, 0x3FFE) // sync
    w.writeBits(1, 0) // reserved
    w.writeBits(1, 0) // fixed blocking
    w.writeBits(4, 7) // block size: explicit 16-bit value follows
    w.writeBits(4, 0) // sample rate: from STREAMINFO
    w.writeBits(4, asgn)
    w.writeBits(3, 0) // sample size: from STREAMINFO
    w.writeBits(1, 0) // reserved
    require(frameIdx < 128, "fixture frame numbers stay 1-byte UTF-8")
    w.writeBits(8, frameIdx)
    w.writeBits(16, n - 1)
    val header = w.bytesSoFar
    w.writeBits(8, Flac.crc8(header, 0, header.length))
    var c = 0
    while (c < nCh) {
      val extra = (asgn, c) match {
        case (8, 1) | (9, 0) | (10, 1) => 1
        case _ => 0
      }
      encodeSubframe(w, stored(c), bps + extra, mode(frameIdx, c), partOrder,
        escape, wasted, riceMethod)
      c += 1
    }
    w.align()
    val body = w.bytesSoFar
    w.writeBits(16, Flac.crc16(body, 0, body.length))
    w.bytesSoFar
  }

  private def sbits(w: BitWriter, nb: Int, v: Long): Unit =
    w.writeBits(nb, v & ((1L << nb) - 1))

  private def encodeSubframe(w: BitWriter, s0: Array[Long], bps: Int,
      mode: Mode, partOrder: Int, escape: Boolean, wasted: Int,
      riceMethod: Int): Unit = {
    // wasted-bits form: samples must all be divisible by 2^wasted;
    // the coded stream carries s >> wasted in (bps - wasted) bits
    val s = if (wasted == 0) s0 else s0.map { v =>
      require((v & ((1L << wasted) - 1)) == 0, "sample not divisible for wasted bits")
      v >> wasted
    }
    val eff = bps - wasted
    val n = s.length
    w.writeBit(0) // padding
    mode match {
      case Constant =>
        require(s.forall(_ == s(0)))
        w.writeBits(6, 0)
        writeWasted(w, wasted)
        sbits(w, eff, s(0))
      case Verbatim =>
        w.writeBits(6, 1)
        writeWasted(w, wasted)
        s.foreach(v => sbits(w, eff, v))
      case Fixed(order) =>
        w.writeBits(6, 8 + order)
        writeWasted(w, wasted)
        (0 until order).foreach(i => sbits(w, eff, s(i)))
        val res = Array.tabulate(n - order) { k =>
          val i = k + order
          order match {
            case 0 => s(i)
            case 1 => s(i) - s(i - 1)
            case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
            case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
            case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
          }
        }
        writeResidual(w, res, n, order, partOrder, escape, riceMethod)
      case Lpc(coefs, shift, precision) =>
        val order = coefs.size
        w.writeBits(6, 0x20 | (order - 1))
        writeWasted(w, wasted)
        (0 until order).foreach(i => sbits(w, eff, s(i)))
        w.writeBits(4, precision - 1)
        sbits(w, 5, shift)
        coefs.foreach(cf => sbits(w, precision, cf))
        val res = Array.tabulate(n - order) { k =>
          val i = k + order
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * s(i - 1 - j); j += 1 }
          s(i) - (acc >> shift)
        }
        writeResidual(w, res, n, order, partOrder, escape, riceMethod)
    }
  }

  private def writeWasted(w: BitWriter, wasted: Int): Unit =
    if (wasted == 0) w.writeBit(0)
    else {
      w.writeBit(1)
      (0 until wasted - 1).foreach(_ => w.writeBit(0))
      w.writeBit(1) // unary: wasted = zeros + 1
    }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Smallest signed width holding every value (0 iff all zero). */
  private def signedWidth(vs: Seq[Long]): Int =
    if (vs.forall(_ == 0L)) 0
    else (1 to 32).find(nb => vs.forall(v =>
      v >= -(1L << (nb - 1)) && v <= (1L << (nb - 1)) - 1)).get

  private def writeResidual(w: BitWriter, res: Array[Long], blockSize: Int,
      order: Int, partOrder: Int, escape: Boolean, riceMethod: Int): Unit = {
    w.writeBits(2, riceMethod) // 0: 4-bit rice params, 1: 5-bit
    w.writeBits(4, partOrder)
    val pBits = if (riceMethod == 0) 4 else 5
    val escapeCode = (1 << pBits) - 1
    val parts = 1 << partOrder
    require(blockSize % parts == 0)
    val perPart = blockSize / parts
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      val part = res.slice(idx, idx + count)
      if (escape) {
        w.writeBits(pBits, escapeCode)
        val raw = signedWidth(part.toSeq)
        w.writeBits(5, raw)
        part.foreach(v => sbits(w, raw, v))
      } else {
        val param = bestRice(part, escapeCode - 1)
        w.writeBits(pBits, param)
        part.foreach { v =>
          val u = zigzag(v)
          val q = (u >>> param).toInt
          w.writeBits(q + 1, 1) // q zeros then the terminating 1
          if (param > 0) w.writeBits(param, u & ((1L << param) - 1))
        }
      }
      idx += count
      p += 1
    }
  }

  private def bestRice(part: Array[Long], maxParam: Int): Int =
    (0 to maxParam).minBy { p =>
      part.foldLeft(0L)((acc, v) => acc + (zigzag(v) >>> p) + 1 + p)
    }
}
