package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, plus a feature-extraction stage shaped like a real decoder
  * pipeline.
  *
  * The image/audio codec libraries are not available in this environment,
  * so `decodeStub` is a clearly-marked deterministic fake — but the
  * Spark-side plumbing is the real design:
  *  - media rides in a `binary` column next to a metadata struct
  *    (mime/byte_len), exactly how 100 TB image datasets store shards;
  *  - decode runs in `mapPartitions` so a real decoder would amortize
  *    model/codec init once per partition (the Scala analog of a Pandas
  *    UDF over mapInPandas);
  *  - output is a fixed-width feature vector + dimensions, ready for the
  *    Similarity operators.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String)

  final case class MediaFeature(
      doc_id: Long, width: Int, height: Int, byte_len: Long,
      feature: Array[Float])

  /** Pack a text column as a binary media column (stand-in for image
    * bytes in the fixtures) with metadata.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      lit("application/octet-stream").as("mime"))

  /** STUB decoder — deterministic fake standing in for an image decode
    * (??? in spirit: no codec libs in this container). Derives pseudo
    * dimensions and a 8-float feature from the bytes. Replace the body
    * with a real decoder; the partition-wise batching, signature and
    * schema are the production shape.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val len = bytes.length
    val width = 64 + (len % 577)
    val height = 64 + ((len * 7) % 417)
    val feature = Array.tabulate(8) { i =>
      if (len == 0) 0f
      else bytes(i % len).toFloat / 255f
    }
    (width, height, feature)
  }

  /** Partition-wise feature extraction over the media column. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE in a real decoder (codec/model)
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeStub(bytes)
          MediaFeature(id, w, h, bytes.length.toLong, f)
        }
      }
  }
}
