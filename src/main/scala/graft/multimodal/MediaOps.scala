package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, per-partition batched
  * decoding (the pattern that amortizes a codec/model handle per
  * partition instead of per row), explode-shaped frame sampling,
  * fixed-width embedding output ready for VectorQueries — and the
  * IMAGE path decodes for real via `javax.imageio` (JDK-bundled:
  * PNG/BMP/GIF/JPEG, no new dependencies), converting to row-major
  * 8-bit luminance, and the AUDIO path decodes WAV/AIFF PCM via
  * `javax.sound.sampled` (also JDK-bundled). Compressed audio
  * (mp3/ogg) and video codecs aren't in the JDK, so those inputs
  * fall back to `decodeStub`'s deterministic fake — swapping in a
  * real codec changes ONE function and no plan shape.
  *
  * Scale notes: media blobs ride the plan as opaque binary — never
  * shuffled unless an op needs them (feature extraction is a narrow
  * map; frame sampling explodes rows but projects away the source
  * blob first-class). Partition sizing for 100 TB of media is by
  * bytes not rows: keep `spark.sql.files.maxPartitionBytes` at the
  * default 128 MB and let blobs dominate row width.
  */
object MediaOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),            // image | audio | video
    StructField("uri", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("codec", StringType))))))

  case class Decoded(media_id: Long, width: Int, height: Int, pixels: Array[Byte])
  case class Feature(media_id: Long, embedding: Array[Float])
  case class Frame(media_id: Long, frame_no: Int, content: Array[Byte])

  /** Real image decode via the JDK's ImageIO: PNG/BMP/GIF/JPEG bytes
    * → (width, height, row-major 8-bit luminance). Grayscale images
    * decode to their exact sample values; color converts by the
    * ITU-R BT.601 integer luma (299r+587g+114b)/1000. Returns None
    * when no registered reader accepts the bytes. */
  def decodeImage(content: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    // ImageIO.read returns null for unrecognized formats but THROWS
    // for recognized-but-corrupt bytes (truncated PNG etc.) — both
    // must degrade to the stub, not kill the task: one bad blob in a
    // bulk ingest must never abort the job.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h)
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
        img.getRaster.getDataElements(0, 0, w, h, out)
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            out(y * w + x) = lum.toByte
            x += 1
          }
          y += 1
        }
      }
      Some((w, h, out))
    }
  }

  /** Real audio decode via the JDK's AudioSystem: WAV/AIFF bytes →
    * (frameLength, channels, raw PCM bytes) — the Decoded shape with
    * width = frame count and height = channel count, pixels = the
    * PCM byte stream. Returns None for formats the JDK can't read
    * (mp3/ogg — those need codec libraries). */
  def decodeAudio(content: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        // frame count from the bytes actually read — getFrameLength
        // can be NOT_SPECIFIED (-1) for some stream types and its
        // .toInt would wrap past 2^31 frames
        val frames = pcm.length / math.max(fmt.getFrameSize, 1)
        Some((frames, fmt.getChannels, pcm))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** STUB decoder for the kinds whose codecs aren't in this container
    * (audio/video — a real implementation would sit exactly here):
    * produces width*height "pixels" by a rolling hash of the content
    * bytes. Deterministic in (content, meta) so tests and re-runs
    * agree. */
  def decodeStub(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val n = math.max(width * height, 0)
    val out = new Array[Byte](n)
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    i = 0
    while (i < n) { h = h * 6364136223846793005L + 1442695040888963407L; out(i) = (h >>> 56).toByte; i += 1 }
    out
  }

  /** Batched decode: mapPartitions so a real implementation opens
    * its codec/model handle once per partition and feeds batches —
    * the Scala analog of mapInPandas' iterator-of-batches shape. */
  def decode(media: DataFrame): Dataset[Decoded] = {
    implicit val enc = Encoders.product[Decoded]
    media.select(col("media_id"), col("content"), col("kind"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .mapPartitions { rows =>
        // (a stateful codec would open once per partition here)
        rows.map { r =>
          val id = r.getLong(0)
          val content = r.getAs[Array[Byte]](1)
          val kind = if (r.isNullAt(2)) "" else r.getString(2)
          val w = if (r.isNullAt(3)) 0 else r.getInt(3)
          val h = if (r.isNullAt(4)) 0 else r.getInt(4)
          val real = kind match {
            case "image" => decodeImage(content)
            case "audio" => decodeAudio(content)
            case _ => None
          }
          real match {
            case Some((rw, rh, px)) => Decoded(id, rw, rh, px)
            case None => Decoded(id, w, h, decodeStub(content, w, h))
          }
        }
      }
  }

  /** Feature extraction: fixed-width float embedding per media row —
    * here a normalized 64-bin byte histogram of the decoded pixels
    * (a stand-in with the exact schema/batch shape of a vision
    * encoder). Output plugs straight into VectorQueries. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[Feature] = {
    implicit val enc = Encoders.product[Feature]
    decode(media).mapPartitions { decoded =>
      decoded.map { d =>
        val hist = new Array[Float](dim)
        var i = 0
        while (i < d.pixels.length) {
          hist((d.pixels(i) & 0xFF) * dim / 256) += 1f
          i += 1
        }
        val n = math.max(d.pixels.length, 1).toFloat
        var j = 0
        while (j < dim) { hist(j) /= n; j += 1 }
        Feature(d.media_id, hist)
      }
    }
  }

  /** Resize: decoded pixels down/up-sampled by nearest-neighbor on
    * the fake pixel grid — schema-identical to a real resize. */
  def resize(media: DataFrame, outW: Int, outH: Int): Dataset[Decoded] = {
    implicit val enc = Encoders.product[Decoded]
    decode(media).map { d =>
      val out = new Array[Byte](outW * outH)
      var y = 0
      while (y < outH) {
        var x = 0
        while (x < outW) {
          val sx = if (outW == 0) 0 else x * math.max(d.width, 1) / outW
          val sy = if (outH == 0) 0 else y * math.max(d.height, 1) / outH
          val idx = sy * d.width + sx
          out(y * outW + x) = if (idx < d.pixels.length && idx >= 0) d.pixels(idx) else 0
          x += 1
        }
        y += 1
      }
      Decoded(d.media_id, outW, outH, out)
    }
  }

  /** Frame sampling for video rows: every Nth fixed-stride slice of
    * the blob becomes a frame row (explode shape — one input row to
    * many frame rows, source blob projected away before any
    * downstream shuffle). */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("content"))
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = bytes.length / math.max(frameBytes, 1)
        (0 until nFrames by math.max(everyN, 1)).map { f =>
          Frame(r.getLong(0), f,
            java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes))
        }
      }
  }
}
