package graft

import graft.multimodal.MediaOps

/** Decoder robustness under hostile bytes: one corrupt blob in a bulk
  * ingest must degrade (None / stub), never throw, hang, or kill the
  * task. Seeded generators keep every failure reproducible. */
class MediaFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xF00DF00DL)

  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  test("audio decoders survive arbitrary byte soup") {
    for (_ <- 1 to 200) {
      val blob = randomBytes(rnd.nextInt(512))
      MediaOps.decodeAudio(blob)        // may be None — must not throw
      MediaOps.decodeImaAdpcmWav(blob)
    }
  }

  test("multi-frame image decode survives arbitrary byte soup") {
    for (_ <- 1 to 200) {
      MediaOps.decodeImageFrames(randomBytes(rnd.nextInt(512))) // None, no throw
    }
  }

  test("perceptual hashes are total on arbitrary planes and PCM") {
    // empty inputs, odd PCM lengths, dims that disagree with the
    // buffer, zero/negative dims — every combination must return a
    // value, never throw
    assert(MediaOps.pHash64(Array.emptyByteArray, 0, 0) == 0L)
    assert(MediaOps.audioHash64(Array.emptyByteArray, 1) == 0L)
    assert(MediaOps.audioHash64(Array[Byte](7), 1) == 0L) // < one sample
    for (_ <- 1 to 100) {
      val n = rnd.nextInt(600)
      val plane = randomBytes(n)
      MediaOps.pHash64(plane, rnd.nextInt(40) - 2, rnd.nextInt(40) - 2)
      MediaOps.dHash64(plane, rnd.nextInt(40) - 2, rnd.nextInt(40) - 2)
      MediaOps.audioHash64(plane, 1 + rnd.nextInt(3))
    }
  }

  test("crafted RIFF chunks (negative / zero / huge sizes) terminate") {
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def riff(chunks: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(chunks.length + 4) ++
        "WAVE".getBytes("US-ASCII") ++ chunks
    // the exact shape that previously spun forever: a chunk whose
    // size field makes the walker's step zero (-8) or negative
    for (sz <- Seq(-8, -9, -1, 0, Int.MinValue, Int.MaxValue)) {
      val wav = riff("fmt ".getBytes("US-ASCII") ++ le32(sz) ++ randomBytes(16))
      assert(MediaOps.decodeImaAdpcmWav(wav).isEmpty)
      MediaOps.decodeAudio(wav) // must return, not hang
    }
    // truncated fmt chunks: sizes that leave fewer bytes than the
    // header fields the parser reads
    for (n <- 0 to 24) {
      val wav = riff("fmt ".getBytes("US-ASCII") ++ le32(16) ++ randomBytes(n))
      MediaOps.decodeImaAdpcmWav(wav) // None or Some — just no throw
    }
  }

  test("ADPCM blocks of arbitrary bytes decode without throwing") {
    val out = new java.io.ByteArrayOutputStream()
    for (_ <- 1 to 100) {
      // ≥ 4 bytes (mono header) and ≥ 8 (stereo headers) — the block
      // slicer in decodeImaAdpcmWav guarantees this via blockAlign
      MediaOps.decodeImaAdpcmBlock(randomBytes(4 + rnd.nextInt(64)), out)
      MediaOps.decodeImaAdpcmBlockN(randomBytes(8 + rnd.nextInt(64)), 2, out)
    }
  }

  test("image decoder survives arbitrary byte soup and magic-byte prefixes") {
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      Array[Byte]('B', 'M'),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte), // JPEG SOI
      "GIF89a".getBytes("US-ASCII"))
    for (_ <- 1 to 50; m <- magics)
      MediaOps.decodeImage(m ++ randomBytes(rnd.nextInt(128))) // None, no throw
  }

  test("parseItems survives arbitrary strings (P11 guard, fuzzed)") {
    val samples = Seq("", "{", "null", "[]", "{\"data\": 42}",
      "{\"data\": {\"x\": 1}}", "\u0000\u0001binary",
      new String(randomBytes(64), "ISO-8859-1"))
    for (s <- samples) {
      val n = graft.sources.HttpSource.parseItems(spark, "v-fuzz", s).count()
      assert(n == 0, s"fuzz input parsed to $n rows: ${s.take(30)}")
    }
  }
}
