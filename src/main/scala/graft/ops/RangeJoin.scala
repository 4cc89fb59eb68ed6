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
    // withColumn would silently OVERWRITE an input column with one of
    // these names and corrupt the result — fail loudly instead
    val reserved = Set("_bucket", "_hi1")
    val clashes = (points.columns ++ intervals.columns).filter(reserved)
    require(clashes.isEmpty,
      s"input columns ${clashes.mkString(", ")} clash with internal " +
        "working columns (_bucket, _hi1) — rename them first")
    // integer floor-division for bucket ids: `col / width` is DOUBLE
    // division in Spark, which loses exactness for keys above 2^53
    // (nanosecond timestamps) and would silently drop matches whose
    // point and interval round into different buckets. `div` truncates
    // toward zero, so negative keys get a −1 correction when a remainder
    // exists — an exact floor with NO intermediate that can overflow
    // (the `key - pmod(key, w)` formulation underflows under ANSI for
    // keys within `w` of Long.MinValue).
    def bucketSql(name: String): String =
      s"((`$name` div ${width}L) - (CASE WHEN `$name` % ${width}L < 0 THEN 1 ELSE 0 END))"
    def bucketOf(name: String): Column = expr(bucketSql(name))
    val p = points.withColumn("_bucket", bucketOf(pointCol))
    // the guard lives INSIDE the sequence-start expression — a separate
    // dropped column would be pruned by Catalyst and never evaluate.
    // It compares BUCKET IDS via try_subtract, not the raw span: `hi - lo`
    // overflows for extreme dirty bounds (lo near Long.MinValue, hi near
    // Long.MaxValue) — under ANSI that kills the task with an opaque
    // ARITHMETIC_OVERFLOW before any guard runs, and with ANSI off it
    // wraps negative and silently PASSES a raw-span guard, handing
    // sequence() the very blowup the guard exists to prevent. Bucket ids
    // are key/width so their difference only overflows at width = 1 with
    // both bounds near the Long extremes; try_subtract turns exactly that
    // case into NULL, which the guard treats as over-limit.
    val bucketSpan = expr(
      s"try_subtract(${bucketSql("_hi1")}, ${bucketSql(loCol)})")
    val guardedStart = when(
      bucketSpan.isNull || bucketSpan > maxBucketsPerInterval.toLong,
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
