package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Flac, MediaOps}
import FlacTestEncoder._

/** Bit-exact FLAC decoding. Fixtures come from FlacTestEncoder (an
  * independent implementation of the published format's WRITE side);
  * the CRC polynomials are pinned against published check values
  * first so encoder/decoder symmetry cannot hide a wrong CRC, and
  * the predictor paths are cross-checked against each other (the
  * same PCM through verbatim / fixed / LPC subframes must decode
  * identically). */
class FlacSpec extends AnyFunSuite {

  // deterministic 16-bit test signal: a sine-ish ramp plus seeded
  // noise — compressible enough for fixed/LPC, noisy enough for rice
  private def signal(n: Int, seed: Int, amp: Int = 12000): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      val base = (math.sin(i / 23.0) * amp).toLong
      val noise = rnd.nextInt(201) - 100
      math.max(-32768, math.min(32767, base + noise))
    }
  }

  /** Interleaved little-endian expected PCM at `bytesPer` width. */
  private def pcmN(chans: Array[Array[Long]], bytesPer: Int): Array[Byte] = {
    val n = chans(0).length
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 0 until n; c <- chans.indices; b <- 0 until bytesPer)
      out.write(((chans(c)(i) >> (8 * b)) & 0xFF).toInt)
    out.toByteArray
  }

  private def pcm16(chans: Array[Array[Long]]): Array[Byte] = pcmN(chans, 2)

  private def roundTrip(chans: Array[Array[Long]], label: String,
      stereo: String = "independent",
      mode: (Int, Int) => Mode = (_, _) => Fixed(2),
      blockSize: Int = 256, partOrder: Int = 0, escape: Boolean = false,
      wasted: Int = 0): Unit = {
    val flac = encode(chans, bps = 16, blockSize = blockSize, stereo = stereo,
      mode = mode, partOrder = partOrder, escape = escape, wasted = wasted)
    val dec = Flac.decode(flac)
    assert(dec.isDefined, s"$label: decode failed")
    val (frames, nCh, bytes) = dec.get
    assert(frames == chans(0).length, s"$label: frame count $frames")
    assert(nCh == chans.length, s"$label: channels $nCh")
    assert(java.util.Arrays.equals(bytes, pcm16(chans)),
      s"$label: PCM mismatch")
  }

  test("CRC polynomials match the published check values") {
    val check = "123456789".getBytes("US-ASCII")
    // CRC-8/SMBUS (poly 0x07, init 0): 0xF4
    assert(Flac.crc8(check, 0, check.length) == 0xF4)
    // CRC-16/UMTS a.k.a. BUYPASS (poly 0x8005, init 0): 0xFEE8
    assert(Flac.crc16(check, 0, check.length) == 0xFEE8)
  }

  test("mono 16-bit round-trips bit-exactly through every subframe type") {
    val s = Array(signal(1000, 1)) // 4 frames of 256 incl. short last
    roundTrip(s, "verbatim", mode = (_, _) => Verbatim)
    for (order <- 0 to 4)
      roundTrip(s, s"fixed$order", mode = (_, _) => Fixed(order))
    roundTrip(s, "lpc2", mode = (_, _) => Lpc(Seq(5L, -3L), 1, 6))
    roundTrip(s, "lpc4", mode = (_, _) => Lpc(Seq(3L, -4L, 2L, -1L), 2, 5))
  }

  test("constant subframes and mixed per-frame modes decode exactly") {
    val const = Array(Array.fill(600)(-12345L))
    roundTrip(const, "constant", mode = (_, _) => Constant)
    // different subframe type per frame in one stream
    val s = Array(signal(700, 7))
    roundTrip(s, "mixed", mode = (f, _) => f % 3 match {
      case 0 => Verbatim
      case 1 => Fixed(3)
      case 2 => Lpc(Seq(2L, -1L), 0, 4)
    })
  }

  test("all four stereo assignments reconstruct the same two channels") {
    val l = signal(800, 11)
    val r = signal(800, 12, amp = 9000)
    for (st <- Seq("independent", "leftside", "rightside", "midside"))
      roundTrip(Array(l, r), st, stereo = st)
  }

  test("rice partitions and the raw-bits escape round-trip") {
    val s = Array(signal(1024, 21))
    roundTrip(s, "partitions", blockSize = 512, partOrder = 2)
    roundTrip(s, "escape", escape = true)
    roundTrip(s, "escape+partitions", blockSize = 512, partOrder = 1, escape = true)
  }

  test("rice method 1 (5-bit parameters) decodes identically to method 0") {
    val s = Array(signal(600, 91))
    val m0 = Flac.decode(encode(s, 16, 256, riceMethod = 0)).get._3
    val m1 = Flac.decode(encode(s, 16, 256, riceMethod = 1)).get._3
    assert(java.util.Arrays.equals(m0, m1), "methods disagree")
    assert(java.util.Arrays.equals(m1, pcm16(s)))
    // the 5-bit escape code (31) must also round-trip
    val esc = Flac.decode(encode(s, 16, 256, riceMethod = 1, escape = true)).get._3
    assert(java.util.Arrays.equals(esc, pcm16(s)))
  }

  test("8-bit and 24-bit depths round-trip at their own byte widths") {
    val s8 = Array(Array.tabulate(400)(i => ((i * 37 + 11) % 256 - 128).toLong))
    val f8 = Flac.decode(encode(s8, 8, 128)).get
    assert(f8._1 == 400 && f8._2 == 1)
    assert(java.util.Arrays.equals(f8._3, pcmN(s8, 1)), "8-bit PCM mismatch")
    val rnd = new scala.util.Random(97)
    val s24 = Array(Array.fill(400)((rnd.nextInt(1 << 24) - (1 << 23)).toLong))
    val f24 = Flac.decode(encode(s24, 24, 128, mode = (_, _) => Verbatim)).get
    assert(f24._1 == 400 && f24._2 == 1)
    assert(java.util.Arrays.equals(f24._3, pcmN(s24, 3)), "24-bit PCM mismatch")
  }

  test("wasted bits: left-shifted samples are restored exactly") {
    val s = Array(signal(500, 31, amp = 7000).map(_ << 2))
    roundTrip(s, "wasted2", wasted = 2)
  }

  test("identical PCM through verbatim, fixed, and LPC decodes identically") {
    // three independent predictor paths must agree — a decoder bug in
    // any one of them breaks this cross-check even if its encoder
    // twin has the same bug's inverse
    val s = Array(signal(512, 41))
    val outs = Seq(
      (_: Int, _: Int) => Verbatim,
      (_: Int, _: Int) => Fixed(2),
      (_: Int, _: Int) => Lpc(Seq(4L, -2L), 1, 5)).map { m =>
      Flac.decode(encode(s, 16, 256, mode = m)).get._3.toSeq
    }
    assert(outs.distinct.size == 1, "predictor paths disagree")
    assert(outs.head == pcm16(s).toSeq)
  }

  test("corruption is detected, never mis-decoded: CRCs and truncation") {
    val s = Array(signal(400, 51))
    val flac = encode(s, 16, 256)
    assert(Flac.decode(flac).isDefined)
    // flip one byte in the frame payload region → CRC must catch it
    val corrupt = flac.clone()
    corrupt(flac.length - 20) = (corrupt(flac.length - 20) ^ 0x40).toByte
    assert(Flac.decode(corrupt).isEmpty, "corrupt payload not rejected")
    // truncation at any point → None, never a crash
    for (cut <- Seq(3, 10, 40, flac.length / 2, flac.length - 3))
      assert(Flac.decode(java.util.Arrays.copyOf(flac, cut)).isEmpty,
        s"truncated at $cut not rejected")
    // non-FLAC bytes
    assert(Flac.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("fuzz: random and mutated streams never throw or hang") {
    val rnd = new scala.util.Random(61)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(300) + 8)
      rnd.nextBytes(junk)
      junk(0) = 'f'; junk(1) = 'L'; junk(2) = 'a'; junk(3) = 'C'
      Flac.decode(junk) // must return, whatever the value
    }
    val valid = encode(Array(signal(300, 71)), 16, 256)
    for (_ <- 0 until 300) {
      val m = valid.clone()
      m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Flac.decode(m) // single-byte mutations: return, never throw
    }
  }

  test("decodeAudio and the decode() operator dispatch FLAC for real") {
    val l = signal(256, 81)
    val r = signal(256, 82)
    val flac = encode(Array(l, r), 16, 256, stereo = "midside")
    val viaAudio = MediaOps.decodeAudio(flac)
    assert(viaAudio.isDefined, "decodeAudio did not dispatch FLAC")
    val (frames, ch, bytes) = viaAudio.get
    assert(frames == 256 && ch == 2)
    assert(java.util.Arrays.equals(bytes, pcm16(Array(l, r))))
    // a decoded FLAC row must NOT be the stub's hash pattern
    val stub = MediaOps.decodeStub(flac, frames, ch)
    assert(!java.util.Arrays.equals(bytes, stub))
  }
}
