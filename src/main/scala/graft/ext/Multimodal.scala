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

  /** STUB resize — deterministic fake of an image resize: real plumbing
    * (binary in, binary out, new dimensions), fake pixels. A real
    * implementation swaps the body for an actual scaler; the schema and
    * partition-wise shape stay.
    */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(1, (targetW * targetH) / 64))
    var i = 0
    while (i < out.length) {
      out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
      i += 1
    }
    out
  }

  /** STUB frame sampling — deterministic fake of video frame extraction:
    * every `stride`-th 64-byte window of the payload becomes a "frame".
    */
  def frameSampleStub(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] = {
    require(stride > 0, s"stride must be positive, got $stride")
    bytes.grouped(64).zipWithIndex
      .collect { case (frame, i) if i % stride == 0 => frame }
      .toSeq
  }

  /** Resize stage over the media column (mapPartitions, codec init
    * amortized per partition in a real decoder).
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        (id, resizeStub(b, targetW, targetH), targetW, targetH)
      })
      .toDF("doc_id", "bytes", "width", "height")
  }

  /** Frame-sampling stage: one output row per sampled frame. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        frameSampleStub(b, stride).zipWithIndex.map { case (f, i) =>
          (id, i.toLong, f)
        }
      })
      .toDF("doc_id", "frame_idx", "frame")
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
