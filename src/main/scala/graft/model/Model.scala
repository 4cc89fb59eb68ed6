package graft.model

import org.apache.spark.sql.types._

/** Canonical output row of the extraction pipeline.
  *
  * Mirrors the reference's fixed 5-string-column output schema
  * (cc2dataset/main.py:285, tests/test_single_warc.py:19):
  *   uid = md5(alt + url), url = absolute media/document URL,
  *   alt = caption ("" allowed except for `image`), ccFilename = source
  *   archive (Container.Filename), pageUrl = embedding page
  *   (WARC-Target-URI).
  */
final case class DocLink(
    uid: String,
    url: String,
    alt: String,
    cc_filename: String,
    page_url: String
)

object DocLink {
  val schema: StructType = StructType(Seq(
    StructField("uid", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("alt", StringType, nullable = true),
    StructField("cc_filename", StringType, nullable = true),
    StructField("page_url", StringType, nullable = true)
  ))
}

/** Document types the reference dispatches on (cc2dataset/main.py:117-131). */
object DocumentType {
  val Image = "image"
  val ImageOnly = "image_only"
  val Audio = "audio"
  val Text = "text"
  val Video = "video"
  val All: Seq[String] = Seq(Image, ImageOnly, Audio, Text, Video)
}

/** Schema of the WAT JSON envelope, restricted to the fields the reference
  * navigates (cc2dataset/main.py:144-164). PERMISSIVE `from_json` turns the
  * reference's key-presence checks into null struct fields, which Catalyst's
  * JSON field pruning then exploits: only these paths are parsed, the rest
  * of the (large) record is skipped.
  */
object WatEnvelope {

  val linkSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("text", StringType),
    StructField("alt", StringType),
    StructField("path", StringType)
  ))

  val schema: StructType = StructType(Seq(
    StructField("Container", StructType(Seq(
      StructField("Filename", StringType)
    ))),
    StructField("Envelope", StructType(Seq(
      StructField("WARC-Header-Metadata", StructType(Seq(
        StructField("WARC-Target-URI", StringType)
      ))),
      StructField("Payload-Metadata", StructType(Seq(
        StructField("HTTP-Response-Metadata", StructType(Seq(
          StructField("HTML-Metadata", StructType(Seq(
            StructField("Head", StructType(Seq(
              StructField("Base", StringType)
            ))),
            StructField("Links", ArrayType(linkSchema))
          )))
        )))
      )))
    )))
  ))
}
