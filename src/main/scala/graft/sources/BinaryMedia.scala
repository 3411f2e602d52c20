package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media payload row: image/audio/video travel as opaque binary columns
  * with typed metadata (north-star multimodal columns). At 100 TB the
  * ingest path is `spark.read.format("binaryFile")` (one row per object,
  * partitioned by file) or parquet with a binary column; metadata rides
  * in a struct exactly as flexcalc's geometry record rides with its array
  * (SURVEY §1.1/§1.2 mapping).
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

case class MediaFeatures(media_id: Long, kind: String, dim: Int,
    features: Array[Float])

case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal binary-column pipeline. The DECODE step is a STUB — this
  * container has no image/audio codecs — implemented as a deterministic
  * payload-hash expansion, clearly marked below. Everything around it
  * (typed Dataset plumbing, per-partition batching, frame sampling,
  * feature schema, partition sizing) is real and tested (BinaryMediaSpec).
  */
object BinaryMedia {

  /** Demo source: wrap the documents corpus as opaque binary payloads
    * (payload = utf8 bytes) with synthesized metadata. Real deployments
    * swap this for binaryFile/parquet ingest; nothing downstream changes.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"), lit("blob").as("kind"),
        col("text").cast("binary").as("payload"),
        lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** Decode + feature-extract. One narrow map stage (mapPartitions), no
    * shuffle; batch shape = one partition of MediaRows in, features out.
    *
    * STUB: a real implementation decodes `payload` with a codec and runs a
    * vision/audio encoder here. The stand-in derives a deterministic
    * feature vector from the payload bytes (seeded by content hash), so
    * tests can assert shape, determinism, and plumbing end-to-end.
    */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        // --- real codec/encoder call goes HERE (stubbed: see Scaladoc) ---
        val rnd = new scala.util.Random(java.util.Arrays.hashCode(r.payload))
        MediaFeatures(r.media_id, r.kind, dim, Array.fill(dim)(rnd.nextFloat()))
      }
    }
  }

  /** Frame sampling: split each payload into `n` contiguous chunks
    * (video frame-sample / audio window analog). Pure byte slicing —
    * deterministic, no codec needed — then exploded to one row per frame
    * so downstream work parallelizes past the per-object granularity.
    */
  def frameSample(ds: Dataset[MediaRow], n: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val len = r.payload.length
      (0 until n).iterator.map { i =>
        val from = (len.toLong * i / n).toInt
        val until = (len.toLong * (i + 1) / n).toInt
        MediaFrame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Resize-metadata transform (image resize analog): pure relational
    * update of the typed metadata travelling with the payload.
    */
  def withScaledMeta(ds: Dataset[MediaRow], factor: Double): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.map(r => r.copy(width = math.max(1, (r.width * factor).toInt),
      height = math.max(1, (r.height * factor).toInt)))
  }
}
