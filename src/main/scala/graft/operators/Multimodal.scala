package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decoded/feature-extracted per partition in batches.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment — `decodeStub` derives deterministic fake features from the
  * bytes); everything around it — schema, batch shape, partition-parallel
  * execution, null handling — is the real design:
  *
  *  - payloads travel as `BinaryType` columns next to their metadata, so
  *    Parquet stores them inline (or as references at 100 TB — swap the
  *    loader, not the pipeline);
  *  - feature extraction runs via `mapPartitions` over an `Iterator`, the
  *    Scala analogue of `mapInPandas`: one decoder init per partition, rows
  *    streamed through in batches, never materializing a partition in memory;
  *  - output schema is declared up front (`featureSchema`) so downstream
  *    plans resolve without running the decoder.
  */
object Multimodal {

  /** Typed media row: payload + metadata the pipeline carries. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: fixed, declared schema. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 digest: String, features: Array[Float])

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("digest", StringType, nullable = true),
    StructField("features", ArrayType(FloatType), nullable = true)))

  /** STUB decoder — stands in for an image/audio codec. Deterministic fake:
    * an 8-dim feature vector derived from byte statistics. Replace with a
    * real codec without touching the surrounding plumbing. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0f)
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out.map(v => v / payload.length * 8)
  }

  /** Batch feature extraction: one pass per partition, decoder state
    * initialized once per partition (the expensive part for real codecs). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights...)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind,
          if (r.payload == null) 0 else r.payload.length,
          digest, decodeStub(r.payload))
      }
    }
  }

  /** Lift a text table into the media pipeline (documents-as-binary), the
    * shape a real pipeline uses for images: (id, kind, payload bytes). */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"), lit("text/plain").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(media_id: Long, frame_idx: Int, ts_ms: Long,
                              frame: Array[Byte])

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = true)))

  /** Frame sampling — the one-row→many-rows generator (UDTF) shape a video
    * pipeline needs. STUB: fixed-size byte windows stand in for decoded
    * frames at a fixed sample interval; a real codec swaps in a
    * keyframe-seeking reader without touching the flatMap plumbing,
    * declared schema, or timestamps. Empty payloads yield no frames. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   everyMs: Long = 1000L): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      val n = (p.length + frameBytes - 1) / frameBytes
      (0 until n).iterator.map { i =>
        MediaFrame(r.media_id, i, i * everyMs,
          java.util.Arrays.copyOfRange(p,
            i * frameBytes, math.min(p.length, (i + 1) * frameBytes)))
      }
    }
  }

  /** Resize — STUB: nearest-neighbor byte-space subsample to a fixed target
    * length (stands in for an image rescale to a fixed resolution; output
    * size is always `targetLen` for non-empty payloads, up- or
    * down-sampling as needed). */
  def resizeStub(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) return Array.empty[Byte]
    val out = new Array[Byte](targetLen)
    var i = 0
    while (i < targetLen) {
      out(i) = payload((i.toLong * payload.length / targetLen).toInt)
      i += 1
    }
    out
  }

  /** Batch resize over the media table (per-partition init point, as in
    * [[extractFeatures]]). */
  def resized(media: Dataset[MediaRow], targetLen: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(payload = resizeStub(r.payload, targetLen)))
    }
  }
}
