package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join — points against half-open intervals `[lo, hi)` — via a
  * BUCKETED EQUI-JOIN: both sides hash into width-sized buckets (an
  * interval registers in every bucket it overlaps), the join runs on
  * the bucket key, and an exact refine filter drops false candidates.
  *
  * Spark plans a raw `p.key >= i.lo AND p.key < i.hi` join as a
  * broadcast nested-loop — quadratic work and a non-starter at 100 TB.
  * Bucketing turns it into one hash shuffle; per-bucket fan-out is
  * bounded by (intervals overlapping the bucket) × (points in it), and
  * interval duplication is ceil(span/width)+1 rows, small when `width`
  * is chosen near the typical span.
  */
object RangeJoin {

  /** Inner-join points to the intervals containing them.
    * @param points    (pointCol, …) — pointCol integral (long)
    * @param intervals (loCol, hiCol, …) — `[lo, hi)` half-open, long
    * @param width     bucket width; pick ≈ the typical interval span
    * @param maxBucketsPerInterval guard against dirty data: ONE open-ended
    *   interval (hi = Long.MaxValue encoding "no end") would otherwise
    *   ask sequence() for billions of bucket rows and kill the job with
    *   an opaque array-size error — fail loudly with the offending
    *   bounds instead
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(width > 0, "bucket width must be positive")
    // integer floor-division for bucket ids: `col / width` is DOUBLE
    // division in Spark, which loses exactness for keys above 2^53
    // (nanosecond timestamps) and would silently drop matches whose
    // point and interval round into different buckets. pmod keeps the
    // remainder non-negative, so the all-integer `div` is an exact floor
    // for negative keys too.
    def bucketOf(name: String): Column =
      expr(s"(`$name` - pmod(`$name`, ${width}L)) div ${width}L")
    val p = points.withColumn("_bucket", bucketOf(pointCol))
    // the guard lives INSIDE the sequence-start expression — a separate
    // dropped column would be pruned by Catalyst and never evaluate
    val guardedStart = when(
      (col(hiCol) - col(loCol)) > width * maxBucketsPerInterval.toLong,
      raise_error(concat(
        lit(s"interval span exceeds $maxBucketsPerInterval buckets of width $width: ["),
        col(loCol), lit(", "), col(hiCol), lit(")"))).cast("long"))
      .otherwise(bucketOf(loCol))
    val i = intervals
      .where(col(loCol) < col(hiCol)) // empty intervals match nothing
      .withColumn("_hi1", col(hiCol) - 1)
      .withColumn("_bucket", explode(sequence(guardedStart, bucketOf("_hi1"))))
      .drop("_hi1")
    p.join(i, Seq("_bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}
