package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** Multimodal plumbing: schema, deterministic stub decode, feature
  * shape, resize dims, frame-sampling explode. */
class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", "mem://a", Array.fill[Byte](256)(7),
        Row(8, 8, null, "fake")),
      Row(2L, "image", "mem://b", Array.tabulate[Byte](512)(_.toByte),
        Row(16, 4, null, "fake")),
      Row(3L, "video", "mem://v", Array.tabulate[Byte](1000)(_.toByte),
        Row(null, null, 5000, "fakev")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
  }

  test("decode is deterministic and honors meta dimensions") {
    val d1 = MediaOps.decode(mediaDf).collect().map(d => d.media_id -> d).toMap
    val d2 = MediaOps.decode(mediaDf).collect().map(d => d.media_id -> d).toMap
    assert(d1(1L).pixels.length == 64)   // 8*8
    assert(d1(2L).pixels.length == 64)   // 16*4
    assert(d1(1L).pixels.toSeq == d2(1L).pixels.toSeq) // deterministic
    assert(d1(1L).pixels.toSeq != d1(2L).pixels.toSeq) // content-dependent
  }

  test("decode reads a real PNG via ImageIO: exact pixels, dims from the image") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    // 2×2 grayscale PNG with known sample values — gray decode is
    // exact (no luma conversion).
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_BYTE_GRAY)
    val samples = Array[Byte](10, 20, 30, 40)
    img.getRaster.setDataElements(0, 0, 2, 2, samples)
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val rows = Seq(
      // meta deliberately wrong (9×9): real decode must use the
      // image's own dimensions, not meta
      Row(7L, "image", "mem://png", png, Row(9, 9, null, "png")),
      // same bytes declared as audio: must take the stub path
      Row(8L, "audio", "mem://aud", png, Row(2, 2, null, "pcm")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
    val d = MediaOps.decode(df).collect().map(x => x.media_id -> x).toMap
    assert(d(7L).width == 2 && d(7L).height == 2)
    assert(d(7L).pixels.toSeq == samples.toSeq)
    assert(d(8L).pixels.toSeq == MediaOps.decodeStub(png, 2, 2).toSeq)
  }

  test("corrupt image bytes fall back to the stub instead of failing the job") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    // valid PNG signature, truncated data → ImageIO.read THROWS
    val truncated = baos.toByteArray.take(20)
    val rows = Seq(Row(11L, "image", "mem://bad", truncated, Row(3, 3, null, "png")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
    val d = MediaOps.decode(df).collect().head
    assert(d.pixels.toSeq == MediaOps.decodeStub(truncated, 3, 3).toSeq)
  }

  test("decode reads a real WAV via AudioSystem: exact PCM bytes") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 100 frames of 16-bit mono PCM with known samples (16-bit WAV is
    // natively signed; 8-bit WAV is unsigned and would shift by 128)
    val pcm = Array.tabulate[Byte](200)(i => ((i * 7) % 256 - 128).toByte)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / fmt.getFrameSize),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    val rows = Seq(Row(9L, "audio", "mem://wav", wav, Row(null, null, 12, "wav")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
    val d = MediaOps.decode(df).collect().head
    assert(d.width == 100 && d.height == 1)   // frames × channels
    assert(d.pixels.toSeq == pcm.toSeq)       // byte-exact PCM
  }

  test("G.711 μ-law and A-law expansion matches the JDK's own codec bit-for-bit") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // all 256 code points — exhaustive, and the oracle is the JDK's
    // independent FormatConversionProvider, not our own math
    val data = Array.tabulate[Byte](256)(_.toByte)
    for ((alaw, enc) <- Seq(
        false -> AudioFormat.Encoding.ULAW, true -> AudioFormat.Encoding.ALAW)) {
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(data),
        new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), data.length)
      val expected = AudioSystem.getAudioInputStream(
        new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false), src).readAllBytes()
      assert(MediaOps.decodeG711(data, alaw).toSeq == expected.toSeq,
        s"alaw=$alaw diverges from the JDK codec")
    }
  }

  test("μ-law WAV decodes through the audio path to expanded 16-bit PCM") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val ulaw = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(ulaw), fmt, ulaw.length),
      AudioFileFormat.Type.WAVE, baos)
    val got = MediaOps.decodeAudio(baos.toByteArray)
    assert(got.isDefined)
    val (frames, channels, pcm) = got.get
    assert(frames == 64 && channels == 1)
    assert(pcm.toSeq == MediaOps.decodeG711(ulaw, alaw = false).toSeq)
  }

  test("IMA ADPCM block decode matches the hand-computed known answer") {
    // pred=0, idx=0, nibbles [7,7,0,8] stepped by hand through the
    // published IMA algorithm (step table 7,16,34,31; shift cascade):
    //   header→0, then 0+11=11, 11+30=41, 41+4=45, 45-3=42
    val block = Array[Byte](0, 0, 0, 0, (7 | (7 << 4)).toByte, (0 | (8 << 4)).toByte)
    val out = new java.io.ByteArrayOutputStream()
    MediaOps.decodeImaAdpcmBlock(block, out)
    val pcm = out.toByteArray
    def s16(i: Int) = (((pcm(2 * i + 1) & 0xFF) << 8) | (pcm(2 * i) & 0xFF)).toShort.toInt
    assert(pcm.length == 10)
    assert((0 until 5).map(s16) == Seq(0, 11, 41, 45, 42))
  }

  test("IMA ADPCM WAV (format the JDK cannot read) decodes end-to-end") {
    // hand-built RIFF/WAVE: fmt tag 0x11, mono, blockAlign 6, 2 blocks
    val blocks = Array[Byte](
      0, 0, 0, 0, (7 | (7 << 4)).toByte, (0 | (8 << 4)).toByte,
      100, 0, 2, 0, 0x33, 0x11) // second block: pred=100, idx=2
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16((v >> 16) & 0xFFFF)
    val fmtChunk = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(0x11) ++ le16(1) ++ le32(8000) ++ le32(4000) ++ le16(6) ++ le16(4)
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(blocks.length) ++ blocks
    val body = "WAVE".getBytes("US-ASCII") ++ fmtChunk ++ dataChunk
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    // the JDK itself rejects this format — our decoder is the only path
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
    }
    val got = MediaOps.decodeAudio(wav)
    assert(got.isDefined)
    val (frames, channels, pcm) = got.get
    assert(frames == 10 && channels == 1) // 2 blocks × (1 header + 4 nibbles)
    def s16(i: Int) = (((pcm(2 * i + 1) & 0xFF) << 8) | (pcm(2 * i) & 0xFF)).toShort.toInt
    assert((0 until 5).map(s16) == Seq(0, 11, 41, 45, 42))
    assert(s16(5) == 100) // second block starts from ITS header predictor
  }

  test("stereo IMA ADPCM interleaves channel groups to frame-interleaved PCM") {
    // left: pred=0 idx=0, nibbles [7,7,0,8,0,0,0,0] — continues the
    // mono known-answer by hand: 11,41,45,42 then step 28,25,23,21
    // gives +3,+3,+2,+2 → 45,48,50,52
    // right: pred=100 idx=2, nibbles all 0 — steps 9,8,7,... give
    // +1,+1,+0,... → 101,102,102,102,102,102,102,102
    val block = Array[Byte](
      0, 0, 0, 0,                      // left header
      100, 0, 2, 0,                    // right header
      0x77.toByte, 0x80.toByte, 0, 0,  // left 4-byte group
      0, 0, 0, 0)                      // right 4-byte group
    val out = new java.io.ByteArrayOutputStream()
    MediaOps.decodeImaAdpcmBlockN(block, 2, out)
    val pcm = out.toByteArray
    def s16(i: Int) = (((pcm(2 * i + 1) & 0xFF) << 8) | (pcm(2 * i) & 0xFF)).toShort.toInt
    assert(pcm.length == 9 * 2 * 2) // 1 header frame + 8 frames, 2ch, 16-bit
    val frames = (0 until 9).map(f => (s16(2 * f), s16(2 * f + 1)))
    assert(frames == Seq((0, 100), (11, 101), (41, 102), (45, 102), (42, 102),
      (45, 102), (48, 102), (50, 102), (52, 102)))

    // and end-to-end through a hand-built stereo WAV
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16((v >> 16) & 0xFFFF)
    val fmtChunk = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(0x11) ++ le16(2) ++ le32(8000) ++ le32(8000) ++ le16(16) ++ le16(4)
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(block.length) ++ block
    val body = "WAVE".getBytes("US-ASCII") ++ fmtChunk ++ dataChunk
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val got = MediaOps.decodeAudio(wav)
    assert(got.isDefined)
    val (nFrames, nCh, pcm2) = got.get
    assert(nFrames == 9 && nCh == 2)
    assert(pcm2.toSeq == pcm.toSeq)
  }

  test("extractFeatures: fixed-width normalized embedding") {
    val f = MediaOps.extractFeatures(mediaDf, dim = 64)
      .collect().map(x => x.media_id -> x.embedding).toMap
    assert(f.values.forall(_.length == 64))
    // histogram is normalized: sums to ~1 for non-empty pixels
    assert(math.abs(f(1L).map(_.toDouble).sum - 1.0) < 1e-5)
  }

  test("resize emits the target dimensions") {
    val r = MediaOps.resize(mediaDf.filter(col("media_id") === 2L), 4, 4).head()
    assert(r.width == 4 && r.height == 4 && r.pixels.length == 16)
  }

  test("sampleFrames explodes only video rows at the stride") {
    val frames = MediaOps.sampleFrames(mediaDf, frameBytes = 100, everyN = 2)
      .collect()
    assert(frames.forall(_.media_id == 3L))
    // 1000 bytes / 100 = 10 frames, every 2nd → frames 0,2,4,6,8
    assert(frames.map(_.frame_no).sorted.toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.content.length == 100))
  }

  test("decodeImageFrames reads a real multi-page TIFF frame-exactly") {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO}
    // 4 pages of 3×2 grayscale with distinct known samples
    val pages = (0 until 4).map { p =>
      Array.tabulate[Byte](6)(i => (p * 40 + i * 5 + 1).toByte)
    }
    val baos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    pages.foreach { px =>
      val img = new BufferedImage(3, 2, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, 3, 2, px)
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val tiff = baos.toByteArray
    val frames = MediaOps.decodeImageFrames(tiff).get
    assert(frames.length == 4)
    frames.zip(pages).foreach { case ((w, h, px), want) =>
      assert(w == 3 && h == 2)
      assert(px.toSeq == want.toSeq)
    }
    // a single-frame PNG decodes as a 1-frame sequence equal to decodeImage
    val one = new BufferedImage(2, 2, BufferedImage.TYPE_BYTE_GRAY)
    one.getRaster.setDataElements(0, 0, 2, 2, Array[Byte](9, 8, 7, 6))
    val pb = new java.io.ByteArrayOutputStream()
    ImageIO.write(one, "png", pb)
    val pngFrames = MediaOps.decodeImageFrames(pb.toByteArray).get
    assert(pngFrames.length == 1)
    assert(pngFrames.head._3.toSeq == MediaOps.decodeImage(pb.toByteArray).get._3.toSeq)
    // junk bytes → None, not a crash
    assert(MediaOps.decodeImageFrames(Array[Byte](1, 2, 3)).isEmpty)
    // the distributed explode emits every 2nd frame with real pixels
    val rows = Seq(Row(21L, "video", "mem://tiff", tiff, Row(3, 2, null, "tiff")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
    val sampled = MediaOps.sampleImageFrames(df, everyN = 2).collect()
      .map(f => f.frame_no -> f.content.toSeq).toMap
    assert(sampled.keySet == Set(0, 2))
    assert(sampled(2) == pages(2).toSeq)
  }

  test("dHash64: gradient known answers, scale and brightness invariance") {
    val w = 18; val h = 16
    // strictly increasing left→right at every grid sample → no
    // left>right comparison fires → hash 0
    val ramp = Array.tabulate[Byte](w * h)(i => ((i % w) * 14).toByte)
    assert(MediaOps.dHash64(ramp, w, h) == 0L)
    // reversed: strictly decreasing → all 64 bits set
    assert(MediaOps.dHash64(ramp.reverse, w, h) == -1L)
    // a textured plane: 2× pixel-replication upscale samples the
    // same source pixels (floor(floor(2a)/2) = floor(a)) → same hash
    val tex = Array.tabulate[Byte](w * h)(i =>
      (((i % w) * 31 + (i / w) * 17) % 180 + 10).toByte)
    val up = Array.tabulate[Byte](w * 2 * h * 2) { i =>
      val x = (i % (w * 2)) / 2; val y = (i / (w * 2)) / 2; tex(y * w + x)
    }
    val hTex = MediaOps.dHash64(tex, w, h)
    assert(MediaOps.dHash64(up, w * 2, h * 2) == hTex)
    // uniform brightness shift preserves every gradient sign
    val bright = tex.map(b => (b + 20).toByte)
    assert(MediaOps.dHash64(bright, w, h) == hTex)
    assert(hTex != 0L && hTex != -1L)
  }

  test("audioHash64: envelope known answers, gain invariance; near-dup vs brute force") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def pcmOf(amps: Array[Int], perWindow: Int): Array[Byte] = {
      // square-ish blocks: every sample in block b has |amplitude|
      // amps(b), alternating sign to keep a real waveform shape
      val out = new Array[Byte](amps.length * perWindow * 2)
      for (b <- amps.indices; i <- 0 until perWindow) {
        val v = if (i % 2 == 0) amps(b) else -amps(b)
        val idx = (b * perWindow + i) * 2
        out(idx) = (v & 0xFF).toByte
        out(idx + 1) = ((v >> 8) & 0xFF).toByte
      }
      out
    }
    // 65 blocks map 1:1 onto the 65 energy windows
    val rampUp = pcmOf(Array.tabulate(65)(b => 100 + b * 400), 64)
    assert(MediaOps.audioHash64(rampUp, 1) == 0L)         // never louder than next
    val rampDown = pcmOf(Array.tabulate(65)(b => 26000 - b * 400), 64)
    assert(MediaOps.audioHash64(rampDown, 1) == -1L)      // always louder than next
    val tex = pcmOf(Array.tabulate(65)(b => 2000 + (b * 5077) % 20000), 64)
    val hTex = MediaOps.audioHash64(tex, 1)
    assert(hTex != 0L && hTex != -1L)
    // -6 dB regrade: halving every sample halves every window energy
    // exactly (amplitudes here are even), envelope order unchanged
    val half = pcmOf(Array.tabulate(65)(b => (2000 + (b * 5077) % 20000) / 2), 64)
    assert(MediaOps.audioHash64(half, 1) == hTex)
    // dual-mono stereo: frame-aligned windows mean L=R interleaving
    // doubles every window energy uniformly — hash-identical to mono
    val stereo = new Array[Byte](tex.length * 2)
    for (f <- 0 until tex.length / 2; c <- 0 to 1) {
      stereo((f * 2 + c) * 2) = tex(f * 2)
      stereo((f * 2 + c) * 2 + 1) = tex(f * 2 + 1)
    }
    assert(MediaOps.audioHash64(stereo, 2) == hTex)

    def wavOf(pcm: Array[Byte]): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / fmt.getFrameSize),
        AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    // a local edit: one block's amplitude bumped — flips at most the
    // two comparisons that window participates in
    val edited = Array.tabulate(65)(b => 2000 + (b * 5077) % 20000)
    edited(30) = 21000
    val rows = Seq(
      Row(1L, "audio", "mem://a", wavOf(tex), Row(null, null, 1, "wav")),
      Row(2L, "audio", "mem://b", wavOf(half), Row(null, null, 1, "wav")),
      Row(3L, "audio", "mem://c", wavOf(pcmOf(edited, 64)), Row(null, null, 1, "wav")),
      Row(4L, "audio", "mem://d", wavOf(rampUp), Row(null, null, 1, "wav")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
    val hashes = MediaOps.audioHashes(df).collect().map(x => x.media_id -> x.phash).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 6
    } yield (a, b, d)).toSet
    val got = MediaOps.audioNearDup(df, maxDist = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"missed=${brute -- got} extra=${got -- brute}")
    assert(got.contains((1L, 2L, 0)))                     // re-grade: identical
    assert(got.exists { case (a, b, _) => (a, b) == (1L, 3L) }, "local edit lost")
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(4L)) > 6,
      "unrelated envelope unexpectedly near")
  }

  test("pHash64: flat-plane known answer, regrade and upscale invariance") {
    val w = 18; val h = 16
    // flat nonzero plane: every AC coefficient is exactly 0, the DC
    // is positive -> only bit 0 (DC > median 0) is set
    assert(MediaOps.pHash64(Array.fill[Byte](w * h)(100.toByte), w, h) == 1L)
    // flat zero plane: all coefficients 0, nothing exceeds the median
    assert(MediaOps.pHash64(Array.fill[Byte](w * h)(0), w, h) == 0L)
    // EVEN-valued texture so the v/2+10 regrade is exactly linear in
    // doubles: AC coefficients and their median halve exactly, DC
    // stays dominant -> bit-identical hash
    val tex = Array.tabulate[Byte](w * h)(i =>
      ((((i % w) * 31 + (i / w) * 17) % 90) * 2).toByte)
    val hTex = MediaOps.pHash64(tex, w, h)
    val regraded = tex.map(v => ((v & 0xFF) / 2 + 10).toByte)
    assert(MediaOps.pHash64(regraded, w, h) == hTex)
    // 2x pixel replication samples identical source pixels
    val up = Array.tabulate[Byte](w * 2 * h * 2) { i =>
      val x = (i % (w * 2)) / 2; val y = (i / (w * 2)) / 2; tex(y * w + x)
    }
    assert(MediaOps.pHash64(up, w * 2, h * 2) == hTex)
    assert(hTex != 0L && hTex != -1L && hTex != 1L)
  }

  test("imageNearDupPHash equals brute-force hamming; blur-robust where dHash flips") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def png(pix: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, pix)
      val baos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val w = 16; val h = 16
    def texture(a: Int, b: Int, c: Int): Array[Byte] =
      Array.tabulate[Byte](w * h)(i =>
        (((i % w) * a + (i / w) * b + c) % 180 + 10).toByte)
    val base = texture(31, 17, 0)
    // 3x3 box blur: kills pixel-level gradients, keeps low frequencies
    val blurred = Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      var s = 0; var n = 0
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val xx = x + dx; val yy = y + dy
        if (xx >= 0 && xx < w && yy >= 0 && yy < h) {
          s += base(yy * w + xx) & 0xFF; n += 1
        }
      }
      (s / n).toByte
    }
    val rows = Seq(
      Row(1L, "image", "mem://base", png(base, w, h), Row(w, h, null, "png")),
      Row(2L, "image", "mem://copy", png(base.clone(), w, h), Row(w, h, null, "png")),
      Row(3L, "image", "mem://blur", png(blurred, w, h), Row(w, h, null, "png")),
      Row(4L, "image", "mem://tex2", png(texture(53, 29, 7), w, h), Row(w, h, null, "png")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
    val hashes = MediaOps.imagePHashes(df).collect().map(x => x.media_id -> x.phash).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 6
    } yield (a, b, d)).toSet
    val got = MediaOps.imageNearDupPHash(df, maxDist = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"missed=${brute -- got} extra=${got -- brute}")
    assert(got.contains((1L, 2L, 0)))
    // the complementary-failure-mode claim, measured: the blur stays
    // inside pHash's threshold but pushes dHash beyond it
    assert(got.exists { case (a, b, _) => (a, b) == (1L, 3L) },
      s"blur drifted beyond pHash threshold: " +
        s"${java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))}")
    val dh = MediaOps.imageHashes(df).collect().map(x => x.media_id -> x.phash).toMap
    assert(java.lang.Long.bitCount(dh(1L) ^ dh(3L)) > 6,
      "expected the box blur to flip dHash gradients beyond the threshold")
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(4L)) > 6,
      "unrelated texture unexpectedly near base under pHash")
  }

  test("imageNearDup equals brute-force hamming over real PNG fixtures") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def png(pix: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, pix)
      val baos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val w = 16; val h = 16
    def texture(a: Int, b: Int, c: Int): Array[Byte] =
      Array.tabulate[Byte](w * h)(i =>
        (((i % w) * a + (i / w) * b + c) % 180 + 10).toByte)
    val base = texture(31, 17, 0)
    // a small local edit: one 2×2 block blown out — touches exactly
    // one 9×8 grid sample, so at most 2 comparisons flip
    val edited = base.clone()
    for (y <- 5 to 6; x <- 5 to 6) edited(y * w + x) = -1 // 255
    val brighter = base.map(v => (v + 15).toByte) // hash-identical re-grade
    val rows = Seq(
      Row(1L, "image", "mem://base", png(base, w, h), Row(w, h, null, "png")),
      Row(2L, "image", "mem://copy", png(base.clone(), w, h), Row(w, h, null, "png")),
      Row(3L, "image", "mem://edit", png(edited, w, h), Row(w, h, null, "png")),
      Row(4L, "image", "mem://grade", png(brighter, w, h), Row(w, h, null, "png")),
      Row(5L, "image", "mem://tex2", png(texture(53, 29, 7), w, h), Row(w, h, null, "png")),
      Row(6L, "image", "mem://tex3", png(texture(7, 101, 77), w, h), Row(w, h, null, "png")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MediaOps.mediaSchema)
    val hashes = MediaOps.imageHashes(df).collect().map(x => x.media_id -> x.phash).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 6
    } yield (a, b, d)).toSet
    val got = MediaOps.imageNearDup(df, maxDist = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"missed=${brute -- got} extra=${got -- brute}")
    // the fixture carries signal: copy and re-grade at hamming 0,
    // the local edit within threshold, unrelated textures beyond it
    assert(got.contains((1L, 2L, 0)))
    assert(got.contains((1L, 4L, 0)))
    assert(got.exists { case (a, b, _) => (a, b) == (1L, 3L) })
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(5L)) > 6,
      "unrelated texture unexpectedly near base")
  }
}
