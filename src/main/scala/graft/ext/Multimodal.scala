package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.3): media as opaque binary
  * columns + typed metadata, with decode/feature-extract as partition-wise
  * batch functions. The Spark-side contract — schema, partitioning, batch
  * shape — is real and tested; the actual media decode is a clearly-marked
  * STUB (no image/audio libs in this container): a deterministic fake that
  * derives "features" from the raw bytes, exercising exactly the data path
  * a real decoder would.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(media_id: Long, n_bytes: Int, feature: Array[Float])

  /** Wrap a text corpus as binary media records (utf-8 payloads) — the
    * ingestion shape for any bytes-typed modality.
    */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRecord]
  }

  /** Partition-wise "decode + feature extraction". Batch shape matches what
    * a vectorized decoder (mapInPandas-style) would use: one iterator pass
    * per partition, no per-row task overhead, no shuffle.
    *
    * STUB: a real implementation would decode `payload` with an image/audio
    * codec here; this deterministic fake folds bytes into a fixed-width
    * float vector (integer lane sums — exact in Float below 2^24, so the
    * output is bit-reproducible cross-engine) so downstream plumbing
    * (schema, similarity, storage) is fully exercised.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val lanes = new Array[Long](dim)
        var i = 0
        while (i < m.payload.length) {
          lanes(i % dim) += (m.payload(i) & 0xff)
          i += 1
        }
        MediaFeatures(m.media_id, m.payload.length, lanes.map(_.toFloat))
      }
    }
  }
}
