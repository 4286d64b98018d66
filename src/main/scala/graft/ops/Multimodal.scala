package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * IMAGE rows are REAL containers: the synthesizer emits valid PNG and
  * BMP files and the decode step parses their actual headers
  * ([[ImageHeaders]] — PNG signature + IHDR, BMP BITMAPINFOHEADER), so
  * `width`/`height` come out of real file bytes. AUDIO/VIDEO decode
  * remains STUBBED (this container ships no AV codecs) behind
  * [[MediaCodecStub]] — a deterministic fake that parses our own
  * synthetic header format. Everything Spark-side is real and tested:
  * schema, size-aware repartitioning, batched per-partition processing
  * (the Scala analog of `mapInPandas` batch shape), and the feature
  * schema `array<float>`.
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
      features: Array[Float]) // FeatureDim-dim embedding (stub)

  val FeatureDim = 16

  /** Deterministic synthetic media table. IMAGE rows are real files —
    * PNG for media_id % 6 == 0, BMP for % 6 == 3 — whose byte lengths
    * follow the closed forms in [[ImageHeaders]]; audio/video rows are
    * magic-tagged stub payloads. Metadata (and image byte lengths) are
    * arithmetic over media_id, so the DuckDB oracle independently
    * verifies the encode→decode round trip against the REAL header
    * parse; only payload body/pixel bytes are seeded-random. */
  def synth(spark: SparkSession, n: Long, partitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val r = new java.util.Random(0xface + i * 7919L)
      val kinds = Array("image", "audio", "video")
      val kind = kinds((i % 3).toInt)
      val w = (16 + (i * 7919L) % 64).toInt
      val h = (16 + (i * 104729L) % 64).toInt
      val frames = if (kind == "video") (1 + (i * 13L) % 30).toInt else 1
      val bodyLen = (64 + (i * 31L) % 192).toInt
      val payload =
        if (kind == "image") {
          if (i % 6 == 0L) ImageHeaders.encodePng(w, h, seed = 0xface + i)
          else ImageHeaders.encodeBmp(w, h, seed = 0xface + i)
        } else MediaCodecStub.encode(kind, w, h, frames, bodyLen, r)
      MediaRow(i, kind, payload, w, h)
    }
  }

  /** Decode + feature-extract, batched per partition (mapPartitions keeps
    * the per-batch codec state/buffer reuse — the `mapInPandas` shape).
    * Oversized payloads become zero-feature rows, never task failures. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val scratch = new Array[Float](FeatureDim) // per-task buffer reuse
      it.map { row =>
        MediaCodecStub.decode(row.payload) match {
          case Some((kind, w, h, frames)) =>
            MediaCodecStub.features(row.payload, scratch)
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

  /** Frame sampling for video rows: one output row per sampled frame
    * (every `stride`-th), via explode — bounded fan-out. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    features.toDF()
      .withColumn("frame",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(stride))))
      .select(col("media_id"), col("kind"), col("frame"), col("features"))
  }
}

/** AUDIO/VIDEO codec stub — deterministic fake in place of real AV
  * decoding (payload format: magic "GMM1" + kind byte + width + height
  * + frames + body bytes; a real deployment swaps the GMM1 branch for
  * JNI/codec calls — the Spark plumbing above is unchanged). IMAGE
  * payloads are NOT stubbed: real PNG/BMP bytes are recognized first
  * and parsed by [[ImageHeaders]]. */
object MediaCodecStub {
  private val Magic = Array[Byte]('G', 'M', 'M', '1')

  def encode(kind: String, w: Int, h: Int, frames: Int, bodyLen: Int,
      r: java.util.Random): Array[Byte] = {
    val body = new Array[Byte](bodyLen)
    r.nextBytes(body)
    val bb = java.nio.ByteBuffer.allocate(4 + 1 + 12 + body.length)
    bb.put(Magic)
    bb.put((kind match {
      case "image" => 0; case "audio" => 1; case _ => 2
    }).toByte)
    bb.putInt(w); bb.putInt(h); bb.putInt(frames)
    bb.put(body)
    bb.array()
  }

  /** Returns (kind, width, height, frames) or None for undecodable.
    * Real PNG/BMP containers are recognized by their own magic and
    * parsed from their actual headers; the GMM1 stub format covers
    * audio/video. */
  def decode(payload: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (payload == null || payload.length < 17) return None
    ImageHeaders.decodePng(payload).foreach { case (w, h, _) =>
      return Some(("image", w, h, 1))
    }
    ImageHeaders.decodeBmp(payload).foreach { case (w, h, _) =>
      return Some(("image", w, h, 1))
    }
    if (payload(0) != 'G' || payload(1) != 'M' || payload(2) != 'M' ||
        payload(3) != '1') return None
    val bb = java.nio.ByteBuffer.wrap(payload, 4, 13)
    val kind = bb.get() match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    Some((kind, bb.getInt(), bb.getInt(), bb.getInt()))
  }

  /** Deterministic hash-derived feature vector (stand-in for a real
    * embedding model); fills `out` in place. */
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
