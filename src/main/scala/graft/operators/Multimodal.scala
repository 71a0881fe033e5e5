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
}
