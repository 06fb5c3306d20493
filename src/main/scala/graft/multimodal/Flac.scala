package graft.multimodal

/** Pure-JVM FLAC decoder — the one mainstream COMPRESSED audio format
  * implementable offline with bit-exact output, because it is
  * lossless integer arithmetic end to end (rice-coded residuals of
  * fixed/LPC predictors; no psychoacoustic transform, no entropy
  * tables beyond unary/rice). Implemented from the published format
  * (RFC 9639): "fLaC" magic → metadata blocks (STREAMINFO gives
  * channels / bits-per-sample / total samples) → frames of
  * independently coded subframes.
  *
  * Covered: CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (orders
  * 1-32) subframes; rice residual methods 0 and 1 (4/5-bit
  * parameters) with partitioning and the raw-bits escape; wasted
  * bits; all four channel assignments (independent, left/side,
  * right/side, mid/side); frame-header CRC-8 and whole-frame CRC-16
  * verification (poly 0x07 / 0x8005 — known-answer-tested in
  * FlacSpec so encoder/decoder symmetry cannot hide a wrong
  * polynomial). Output is interleaved little-endian signed PCM at
  * ceil(bps/8) bytes per sample — the same contract as the WAV path.
  *
  * Anything malformed (bad magic, bad sync, CRC mismatch, truncated
  * bits, reserved codes) returns None rather than throwing: one bad
  * blob in a bulk ingest must never abort the job (MediaOps rule).
  *
  * Reference behavior being re-expressed: the reference pipeline has
  * no media handling at all (SURVEY.md §2.7) — this extends the
  * multimodal column surface the same way decodeG711/decodeImaAdpcm
  * do, as published-spec integer codecs. */
object Flac {

  /** MSB-first bit reader over a byte array. Throws on out-of-bounds
    * (caught by decode's envelope → None). */
  private final class BitReader(data: Array[Byte], startByte: Int) {
    private var bit: Long = startByte.toLong * 8

    def readBit(): Int = {
      val b = (data((bit >> 3).toInt) >> (7 - (bit & 7L)).toInt) & 1
      bit += 1
      b
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readSigned(n: Int): Long = {
      if (n == 0) return 0L
      val v = readBits(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }

    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }

    def alignToByte(): Unit = bit = (bit + 7) & ~7L

    def bytePos: Int = (bit >> 3).toInt

    def atByteBoundary: Boolean = (bit & 7L) == 0
  }

  /** CRC-8, polynomial 0x07, init 0 — the FLAC frame-header CRC. */
  private[graft] def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — the FLAC whole-frame CRC. */
  private[graft] def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private final case class StreamInfo(channels: Int, bps: Int, totalSamples: Long)

  /** Decode a native FLAC stream to (frames, channels, interleaved
    * little-endian signed PCM at ceil(bps/8) bytes/sample) — the
    * decodeAudio contract. None for non-FLAC or malformed input. */
  def decode(content: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decodeOrThrow(content)
    catch { case _: Exception => None }

  private def decodeOrThrow(content: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (content.length < 42 ||
      content(0) != 'f' || content(1) != 'L' || content(2) != 'a' || content(3) != 'C')
      return None
    // metadata blocks: 1-byte (last<<7 | type) + 24-bit BE length
    var off = 4
    var info: Option[StreamInfo] = None
    var last = false
    while (!last) {
      if (off + 4 > content.length) return None
      val hdr = content(off) & 0xFF
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val len = ((content(off + 1) & 0xFF) << 16) |
        ((content(off + 2) & 0xFF) << 8) | (content(off + 3) & 0xFF)
      if (off + 4 + len > content.length) return None
      if (btype == 0) {
        if (len < 34) return None
        val b = off + 4
        val channels = (((content(b + 12) & 0xFF) >> 1) & 0x07) + 1
        val bps = ((((content(b + 12) & 0x01) << 4) |
          ((content(b + 13) & 0xF0) >> 4)) & 0x1F) + 1
        val total = ((content(b + 13) & 0x0FL) << 32) |
          ((content(b + 14) & 0xFFL) << 24) | ((content(b + 15) & 0xFFL) << 16) |
          ((content(b + 16) & 0xFFL) << 8) | (content(b + 17) & 0xFFL)
        info = Some(StreamInfo(channels, bps, total))
      }
      off += 4 + len
    }
    val si = info.getOrElse(return None)
    if (si.totalSamples <= 0) return None // unknown length: not produced here
    val br = new BitReader(content, off)
    val out = new java.io.ByteArrayOutputStream()
    var decoded = 0L
    while (decoded < si.totalSamples) {
      decoded += decodeFrame(content, br, si, out)
    }
    if (decoded != si.totalSamples) return None
    Some((decoded.toInt, si.channels, out.toByteArray))
  }

  /** One frame: header (CRC-8-checked) → one subframe per channel →
    * padding + CRC-16 over the whole frame → stereo reconstruction →
    * interleaved PCM append. Returns the frame's block size. */
  private def decodeFrame(content: Array[Byte], br: BitReader, si: StreamInfo,
      out: java.io.ByteArrayOutputStream): Int = {
    require(br.atByteBoundary)
    val frameStart = br.bytePos
    require(br.readBits(14) == 0x3FFE, "bad frame sync")
    require(br.readBit() == 0, "reserved bit set")
    br.readBit() // blocking strategy — frame/sample number parses identically
    val bsCode = br.readBits(4).toInt
    val srCode = br.readBits(4).toInt
    val chanAsgn = br.readBits(4).toInt
    val ssCode = br.readBits(3).toInt
    require(br.readBit() == 0, "reserved bit set")
    readUtf8Number(br)
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("reserved block size code")
      case 1 => 192
      case n if n <= 5 => 576 << (n - 2)
      case 6 => br.readBits(8).toInt + 1
      case 7 => br.readBits(16).toInt + 1
      case n => 256 << (n - 8)
    }
    srCode match { // sample rate never affects sample VALUES; skip payload
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => throw new IllegalArgumentException("invalid sample rate code")
      case _ => ()
    }
    val headerEnd = br.bytePos
    val crc8Stored = br.readBits(8).toInt
    require(crc8(content, frameStart, headerEnd) == crc8Stored, "frame header CRC-8 mismatch")
    val bps = ssCode match {
      case 0 => si.bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw new IllegalArgumentException("reserved sample size code")
    }
    val nCh = if (chanAsgn < 8) chanAsgn + 1 else 2
    require(nCh == si.channels, "frame/STREAMINFO channel mismatch")
    require(chanAsgn <= 10, "reserved channel assignment")
    // the decorrelated (difference) channel carries one extra bit
    val chans = Array.tabulate(nCh) { c =>
      val extra = chanAsgn match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // side/right
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      decodeSubframe(br, blockSize, bps + extra)
    }
    br.alignToByte()
    val frameEnd = br.bytePos
    val crc16Stored = br.readBits(16).toInt
    require(crc16(content, frameStart, frameEnd) == crc16Stored, "frame CRC-16 mismatch")
    // undo inter-channel decorrelation
    chanAsgn match {
      case 8 => // stored: left, side = left - right
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // stored: side = left - right, right
        var i = 0
        while (i < blockSize) {
          val side = chans(0)(i)
          chans(0)(i) = chans(1)(i) + side
          i += 1
        }
      case 10 => // stored: mid = (l+r)>>1, side = l-r
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ => ()
    }
    // interleave, little-endian, ceil(bps/8) bytes per sample
    val bytesPer = (bps + 7) / 8
    var i = 0
    while (i < blockSize) {
      var c = 0
      while (c < nCh) {
        val v = chans(c)(i)
        var b = 0
        while (b < bytesPer) { out.write(((v >> (8 * b)) & 0xFF).toInt); b += 1 }
        c += 1
      }
      i += 1
    }
    blockSize
  }

  /** The frame/sample number: UTF-8-style variable-length code, up to
    * 7 bytes / 36 bits. The value itself is unused for sequential
    * decoding but the bits must be consumed exactly. */
  private def readUtf8Number(br: BitReader): Long = {
    val first = br.readBits(8).toInt
    var n = 0
    var x = first
    while ((x & 0x80) != 0) { n += 1; x = (x << 1) & 0xFF }
    require(n != 1 && n <= 7, "malformed UTF-8 coded number")
    if (n == 0) return first.toLong
    var v = (first & (0x7F >> n)).toLong
    var i = 1
    while (i < n) {
      val b = br.readBits(8).toInt
      require((b & 0xC0) == 0x80, "malformed UTF-8 continuation")
      v = (v << 6) | (b & 0x3F)
      i += 1
    }
    v
  }

  private def decodeSubframe(br: BitReader, n: Int, bps: Int): Array[Long] = {
    require(br.readBit() == 0, "subframe padding bit set")
    val t = br.readBits(6).toInt
    val wasted =
      if (br.readBit() == 1) br.readUnary() + 1 else 0
    val eff = bps - wasted
    require(eff > 0, "wasted bits exceed sample size")
    val out = new Array[Long](n)
    if (t == 0) { // CONSTANT
      java.util.Arrays.fill(out, br.readSigned(eff))
    } else if (t == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = br.readSigned(eff); i += 1 }
    } else if (t >= 8 && t <= 12) { // FIXED, order = t - 8
      val order = t - 8
      var i = 0
      while (i < order) { out(i) = br.readSigned(eff); i += 1 }
      readResidual(br, n, order, out)
      restoreFixed(out, n, order)
    } else if ((t & 0x20) != 0) { // LPC, order = (t & 31) + 1
      val order = (t & 0x1F) + 1
      var i = 0
      while (i < order) { out(i) = br.readSigned(eff); i += 1 }
      val precision = br.readBits(4).toInt + 1
      require(precision != 16, "invalid LPC precision code")
      val shift = br.readSigned(5).toInt
      require(shift >= 0, "negative LPC shift")
      val coefs = Array.fill(order)(br.readSigned(precision))
      readResidual(br, n, order, out)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe type $t")
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Fixed polynomial predictors 0-4 (the published difference
    * cascade), applied in place over residuals. */
  private def restoreFixed(s: Array[Long], n: Int, order: Int): Unit = {
    var i = order
    while (i < n) {
      order match {
        case 0 => ()
        case 1 => s(i) += s(i - 1)
        case 2 => s(i) += 2 * s(i - 1) - s(i - 2)
        case 3 => s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case 4 => s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
        case _ => throw new IllegalArgumentException("fixed order > 4")
      }
      i += 1
    }
  }

  /** Rice-coded residual: 2-bit method (4- or 5-bit parameters), 4-bit
    * partition order; per partition a rice parameter or the all-ones
    * escape followed by 5-bit raw sample width. Unary quotient +
    * parameter-bit remainder, zigzag-mapped to signed. */
  private def readResidual(br: BitReader, blockSize: Int, order: Int,
      out: Array[Long]): Unit = {
    val method = br.readBits(2).toInt
    require(method <= 1, "reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val pOrder = br.readBits(4).toInt
    val parts = 1 << pOrder
    require((blockSize % parts) == 0, "partition does not divide block")
    val perPart = blockSize / parts
    require(perPart > order || parts > 1, "first partition would be empty")
    var idx = order
    var p = 0
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      val param = br.readBits(pBits).toInt
      if (param == escape) {
        val raw = br.readBits(5).toInt
        var k = 0
        while (k < count) { out(idx) = br.readSigned(raw); idx += 1; k += 1 }
      } else {
        var k = 0
        while (k < count) {
          val q = br.readUnary().toLong
          val r = if (param == 0) 0L else br.readBits(param)
          val v = (q << param) | r
          out(idx) = (v >>> 1) ^ -(v & 1L)
          idx += 1
          k += 1
        }
      }
      p += 1
    }
  }
}
