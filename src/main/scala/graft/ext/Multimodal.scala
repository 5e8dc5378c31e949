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

  /** Fixed-size frame segmentation of binary payloads — the chunking step
    * audio/video pipelines run before per-frame decode (frame-sample →
    * decode → featurize): each payload explodes into `frameBytes`-byte
    * windows with index, content hash, and length (the tail frame is
    * short). Fully declarative — `sequence` + binary `substr` + `md5` stay
    * inside codegen, the explode is a Generate (no shuffle), and
    * per-payload frame counts bound the expansion, so the shape holds at
    * any corpus size.
    */
  def frames(media: Dataset[MediaRecord], frameBytes: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive (got $frameBytes)")
    media.toDF()
      .select(col("media_id"), col("payload"),
        octet_length(col("payload")).as("n_bytes"))
      // empty payloads have no frames — and must not reach sequence(),
      // whose (0, -1) form would count DOWN instead of being empty
      .filter(col("n_bytes") > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0),
          floor((col("n_bytes") - 1) / frameBytes).cast("int"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        md5(expr(s"substr(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_md5"),
        octet_length(
          expr(s"substr(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_len"))
  }
}
