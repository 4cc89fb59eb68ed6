package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplication-aware sample weighting — the "soft dedup" alternative to
  * dropping duplicates: every copy survives, but each carries weight
  * 1/copies, so a document duplicated a thousand times contributes one
  * document's worth of training signal. Pipelines reach for this when a
  * hard dedup would distort the source mix or when the trainer consumes
  * per-example weights anyway (the SlimPajama-style duplication
  * discount).
  *
  * Scale design: copies-per-key is ONE combinable groupBy count (map-
  * side partials collapse a corpus-wide boilerplate key per task); the
  * join-back is AQE-skew-splittable because the count side is exactly
  * one row per key. Weights are integer milli-units (floor of
  * scaleMilli / copies) — bit-identical across engines, no float drift
  * in a number that multiplies gradients.
  */
object Weighting {

  /** Attach `copies` (rows sharing this row's `keys`) and
    * `weight_milli` (= scaleMilli / copies, integer floor) to every
    * row. Keys are usually a content fingerprint
    * ([[TextAnalysis.bagFingerprint]], a uid, a canonical URL).
    */
  def softDedupWeights(df: DataFrame, keys: Seq[String],
      scaleMilli: Long = 1000L): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("copies"))
    df.join(counts, keys)
      .withColumn("weight_milli",
        (lit(scaleMilli) / col("copies")).cast("long"))
  }
}
