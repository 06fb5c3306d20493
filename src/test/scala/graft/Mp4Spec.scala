package graft

import org.apache.spark.sql.Row
import graft.multimodal.{MediaOps, Mp4}

/** ISO-BMFF container parsing against a hand-built MP4: a byte-level
  * fixture assembled from the spec's box layout (ftyp + mdat holding
  * three known frame payloads + moov/trak/mdia/minf/stbl sample
  * tables), so every expected offset/size/timestamp is derived by
  * hand — Mp4.parseVideo must reproduce them exactly, and
  * sampleFrames must emit the exact payload slices. */
class Mp4Spec extends SparkSpec {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  // three frames with recognizable payloads
  private val f0 = Array.tabulate[Byte](5)(i => (10 + i).toByte)
  private val f1 = Array.tabulate[Byte](6)(i => (20 + i).toByte)
  private val f2 = Array.tabulate[Byte](7)(i => (30 + i).toByte)

  /** ftyp(12B) then mdat: first frame lands at offset 20. Chunk 1 at
    * 20 holds f0,f1 (stsc run: 2/chunk); chunk 2 at 31 holds f2.
    * Timescale 1000; stts runs (2,40),(1,50) → dts 0,40,80. Only
    * sample 1 (1-based) is a sync sample. */
  private val fixture: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"))
    val mdat = box("mdat", f0, f1, f2)
    val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0), // version 0 + flags
      be32(0), be32(0),            // ctime, mtime
      be32(1000), be32(130))       // timescale, duration
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
      "vide".getBytes("ISO-8859-1"), new Array[Byte](12))
    val stts = box("stts", Array[Byte](0, 0, 0, 0), be32(2),
      be32(2), be32(40), be32(1), be32(50))
    val stsz = box("stsz", Array[Byte](0, 0, 0, 0), be32(0), be32(3),
      be32(5), be32(6), be32(7))
    val stsc = box("stsc", Array[Byte](0, 0, 0, 0), be32(1),
      be32(1), be32(2), be32(1))
    val stco = box("stco", Array[Byte](0, 0, 0, 0), be32(2),
      be32(20), be32(31))
    val stss = box("stss", Array[Byte](0, 0, 0, 0), be32(1), be32(1))
    val stbl = box("stbl", stts, stsz, stsc, stco, stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    val bytes = ftyp ++ mdat ++ moov
    assert(bytes(20) == 10 && bytes(25) == 20 && bytes(31) == 30,
      "fixture layout drifted — frame offsets no longer 20/25/31")
    bytes
  }

  test("parseVideo resolves offsets, sizes, timestamps, keyframes exactly") {
    val track = Mp4.parseVideo(fixture).get
    assert(track.handler == "vide")
    assert(track.timescale == 1000L)
    assert(track.durationSec == 0.13)
    val s = track.samples
    assert(s.map(x => (x.index, x.offset, x.size, x.dts, x.keyframe)) ==
      IndexedSeq((0, 20L, 5L, 0L, true), (1, 25L, 6L, 40L, false),
        (2, 31L, 7L, 80L, false)))
    assert(s.map(_.tsSec) == IndexedSeq(0.0, 0.04, 0.08))
  }

  test("non-container bytes parse to nothing") {
    assert(Mp4.parseVideo(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
    assert(Mp4.parseVideo(Array.empty[Byte]).isEmpty)
    // truncated fixture must degrade, not throw
    Mp4.parseVideo(fixture.take(40))
  }

  private def mediaDf(rows: (Long, Array[Byte])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, b) =>
        Row(id, "video", s"mem://$id", b, Row(null, null, null, "h264")) }),
      MediaOps.mediaSchema)

  test("sampleFrames walks real frame boundaries for ISO-BMFF blobs") {
    val all = MediaOps.sampleFrames(mediaDf(1L -> fixture), frameBytes = 999,
        everyN = 1).collect().sortBy(_.frame_no)
    assert(all.map(_.frame_no).toSeq == Seq(0, 1, 2))
    assert(all(0).content.toSeq == f0.toSeq)
    assert(all(1).content.toSeq == f1.toSeq)
    assert(all(2).content.toSeq == f2.toSeq)
    // every 2nd frame: true frame indices 0 and 2, not byte strides
    val sampled = MediaOps.sampleFrames(mediaDf(1L -> fixture), 999, everyN = 2)
      .collect().sortBy(_.frame_no)
    assert(sampled.map(_.frame_no).toSeq == Seq(0, 2))
    assert(sampled(1).content.toSeq == f2.toSeq)
  }

  test("sampleFrames keeps the stride fallback for opaque blobs") {
    val blob = Array.tabulate[Byte](10)(_.toByte)
    val frames = MediaOps.sampleFrames(mediaDf(7L -> blob), frameBytes = 4,
      everyN = 1).collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 1))
    assert(frames(0).content.toSeq == blob.slice(0, 4).toSeq)
  }

  test("sampleKeyframes emits exactly the stss sync samples") {
    val keys = MediaOps.sampleKeyframes(mediaDf(1L -> fixture)).collect()
    assert(keys.map(_.frame_no).toSeq == Seq(0))
    assert(keys(0).content.toSeq == f0.toSeq)
    // opaque blob: no honest keyframe notion -> empty
    assert(MediaOps.sampleKeyframes(
      mediaDf(2L -> Array.tabulate[Byte](32)(_.toByte))).collect().isEmpty)
  }
}
