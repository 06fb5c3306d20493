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
  * fixed-width embedding output ready for VectorQueries — while the
  * codec itself is a STUB: this container has no image/audio
  * libraries, so `decodeStub` derives deterministic fake pixels from
  * the bytes. Swapping in a real decoder changes ONE function and no
  * plan shape.
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

  /** STUB decoder — deterministic fake standing in for an image
    * codec (??? in a container with the real library): produces
    * width*height "pixels" by a rolling hash of the content bytes.
    * Deterministic in (content, meta) so tests and re-runs agree. */
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
    media.select(col("media_id"), col("content"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .mapPartitions { rows =>
        // (real impl: val codec = Codec.open() — once per partition)
        rows.map { r =>
          val w = if (r.isNullAt(2)) 0 else r.getInt(2)
          val h = if (r.isNullAt(3)) 0 else r.getInt(3)
          Decoded(r.getLong(0), w, h,
            decodeStub(r.getAs[Array[Byte]](1), w, h))
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
