package graft.multimodal

/** Minimal ISO-BMFF (MP4/MOV/ISO base media) CONTAINER parser — pure
  * JVM, offline-feasible, no codec: walks the box tree
  * (moov → trak → mdia → minf → stbl) and resolves the standard
  * sample-table algebra (ISO/IEC 14496-12 §8: stts decoding deltas,
  * stsz sizes, stsc sample-to-chunk runs, stco/co64 chunk offsets,
  * stss sync samples) into every sample's file offset, byte size,
  * decoding timestamp, and keyframe flag.
  *
  * The codec payload stays opaque — frame PIXEL decode is exactly the
  * part that is infeasible without an entropy-coding stack
  * (MediaOps.decodeStub documents that boundary). What this buys is
  * that video frame sampling (MediaOps.sampleFrames) operates on REAL
  * frame boundaries and REAL timestamps instead of a fixed byte
  * stride: sample-every-Nth-frame / every-keyframe / nearest-to-t
  * all become exact container operations.
  *
  * Scale shape: parsing touches only the moov box (metadata, KBs) —
  * at 100 TB the parse cost per blob is proportional to its sample
  * count, not its payload bytes, and runs inside the same
  * mapPartitions batch as the rest of the media pipeline.
  */
object Mp4 {

  /** One resolved sample (frame for video handlers): `offset`/`size`
    * locate the codec payload inside the blob; `dts` is in track
    * timescale units, `tsSec` the same divided by the mdhd
    * timescale; `keyframe` from stss (every sample when absent). */
  final case class Sample(index: Int, offset: Long, size: Long,
      dts: Long, tsSec: Double, keyframe: Boolean)

  /** One parsed track: `handler` is the mdia hdlr type ("vide",
    * "soun", ...), `timescale` ticks/second, `durationSec` from mdhd,
    * samples in decoding order. */
  final case class Track(handler: String, timescale: Long,
      durationSec: Double, samples: IndexedSeq[Sample])

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Child boxes of [start, end): (type, payloadStart, payloadEnd).
    * Handles 32-bit sizes, size==1 (64-bit largesize) and size==0
    * (extends to end). Malformed sizes end the walk rather than
    * looping or throwing — parse() degrades to None. */
  private def children(b: Array[Byte], start: Long, end: Long): Iterator[(String, Long, Long)] =
    new Iterator[(String, Long, Long)] {
      private var p = start
      def hasNext: Boolean = p + 8 <= end
      def next(): (String, Long, Long) = {
        val size32 = u32(b, p.toInt)
        val typ = fourcc(b, p.toInt + 4)
        val (payload, boxEnd) =
          if (size32 == 0L) (p + 8, end)
          else if (size32 == 1L && p + 16 <= end) (p + 16, p + u64(b, p.toInt + 8))
          else (p + 8, p + size32)
        if (boxEnd <= p || boxEnd > end) { p = end; (typ, payload, math.min(payload, end)) }
        else { p = boxEnd; (typ, payload, boxEnd) }
      }
    }

  private def find(b: Array[Byte], start: Long, end: Long, typ: String): Option[(Long, Long)] =
    children(b, start, end).collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** All tracks with resolvable sample tables. */
  def parseTracks(content: Array[Byte]): Seq[Track] = try {
    val end = content.length.toLong
    find(content, 0L, end, "moov").toSeq.flatMap { case (ms, me) =>
      children(content, ms, me).collect { case ("trak", ts, te) => (ts, te) }
        .flatMap { case (ts, te) => parseTrack(content, ts, te) }.toSeq
    }
  } catch { case _: Exception => Seq.empty }

  /** First video ("vide" handler) track, if any. */
  def parseVideo(content: Array[Byte]): Option[Track] =
    parseTracks(content).find(_.handler == "vide")

  private def parseTrack(b: Array[Byte], ts: Long, te: Long): Option[Track] = for {
    (mdS, mdE) <- find(b, ts, te, "mdia")
    (mhS, _) <- find(b, mdS, mdE, "mdhd")
    (hdS, _) <- find(b, mdS, mdE, "hdlr")
    (mfS, mfE) <- find(b, mdS, mdE, "minf")
    (sbS, sbE) <- find(b, mfS, mfE, "stbl")
    track <- resolveSamples(b, sbS, sbE, mdhdTimescale(b, mhS),
      mdhdDuration(b, mhS), fourcc(b, hdS.toInt + 8))
  } yield track

  // mdhd: version(1)+flags(3), then v0: ctime(4) mtime(4) timescale(4)
  // duration(4); v1: ctime(8) mtime(8) timescale(4) duration(8)
  private def mdhdTimescale(b: Array[Byte], s: Long): Long =
    if (b(s.toInt) == 1) u32(b, s.toInt + 20) else u32(b, s.toInt + 12)
  private def mdhdDuration(b: Array[Byte], s: Long): Long =
    if (b(s.toInt) == 1) u64(b, s.toInt + 24) else u32(b, s.toInt + 16)

  private def resolveSamples(b: Array[Byte], sbS: Long, sbE: Long,
      timescale: Long, duration: Long, handler: String): Option[Track] = for {
    (sttsS, _) <- find(b, sbS, sbE, "stts")
    (stszS, _) <- find(b, sbS, sbE, "stsz")
    (stscS, _) <- find(b, sbS, sbE, "stsc")
    offsets <- find(b, sbS, sbE, "stco")
      .map { case (s, _) =>
        val n = u32(b, s.toInt + 4).toInt
        IndexedSeq.tabulate(n)(i => u32(b, s.toInt + 8 + 4 * i))
      }
      .orElse(find(b, sbS, sbE, "co64").map { case (s, _) =>
        val n = u32(b, s.toInt + 4).toInt
        IndexedSeq.tabulate(n)(i => u64(b, s.toInt + 8 + 8 * i))
      })
  } yield {
    // stsz: uniform sample_size or per-sample table
    val uniform = u32(b, stszS.toInt + 4)
    val nSamples = u32(b, stszS.toInt + 8).toInt
    val sizes: Int => Long =
      if (uniform != 0) _ => uniform
      else i => u32(b, stszS.toInt + 12 + 4 * i)

    // stts: (count, delta) runs -> per-sample dts
    val nStts = u32(b, sttsS.toInt + 4).toInt
    val dts = new Array[Long](nSamples)
    var si = 0; var t = 0L
    var ri = 0
    while (ri < nStts && si < nSamples) {
      val cnt = u32(b, sttsS.toInt + 8 + 8 * ri).toInt
      val delta = u32(b, sttsS.toInt + 12 + 8 * ri)
      var j = 0
      while (j < cnt && si < nSamples) { dts(si) = t; t += delta; si += 1; j += 1 }
      ri += 1
    }

    // stsc: (first_chunk, samples_per_chunk, sdi) runs -> per-chunk counts
    val nStsc = u32(b, stscS.toInt + 4).toInt
    val stsc = IndexedSeq.tabulate(nStsc)(i =>
      (u32(b, stscS.toInt + 8 + 12 * i).toInt,       // first_chunk, 1-based
       u32(b, stscS.toInt + 12 + 12 * i).toInt))     // samples_per_chunk

    // stss: sync-sample numbers (1-based); absent -> all sync
    val sync: Int => Boolean = find(b, sbS, sbE, "stss") match {
      case Some((s, _)) =>
        val n = u32(b, s.toInt + 4).toInt
        val set = (0 until n).map(i => u32(b, s.toInt + 8 + 4 * i).toInt).toSet
        i => set(i + 1)
      case None => _ => true
    }

    // walk chunks: each chunk's samples are contiguous from its offset
    val samples = IndexedSeq.newBuilder[Sample]
    var sample = 0
    var chunk = 0
    while (chunk < offsets.length && sample < nSamples) {
      val perChunk = stsc.takeWhile(_._1 <= chunk + 1).lastOption.map(_._2).getOrElse(0)
      var off = offsets(chunk)
      var j = 0
      while (j < perChunk && sample < nSamples) {
        val sz = sizes(sample)
        samples += Sample(sample, off, sz, dts(sample),
          if (timescale > 0) dts(sample).toDouble / timescale else 0.0,
          sync(sample))
        off += sz; sample += 1; j += 1
      }
      chunk += 1
    }
    Track(handler, timescale,
      if (timescale > 0) duration.toDouble / timescale else 0.0,
      samples.result())
  }
}
