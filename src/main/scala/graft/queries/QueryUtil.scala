package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query battery.
  *
  * Determinism rules (SURVEY.md §7.3): every oracle-checked query is
  * ORDER'd on a unique key, money aggregates run in exact integer cents
  * (sum of bigints is order-independent; float summation is not), and
  * dedup uses either single-column keys or row_number tie-breaks.
  */
object QueryUtil {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads via
    * the nanosAsLong legacy conf. Values carry µs precision, so normalize
    * to a proper TimestampType via integer `div` (double division would
    * lose precision above 2^53 ns). Oracle side mirrors with
    * `ts::TIMESTAMP` (ns → µs truncation).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Exact cents: 2-decimal doubles → bigint. round() kills the ~1e-9
    * binary-representation error; both Spark and DuckDB land on the same
    * integer, and bigint sums are order-independent (unlike double sums,
    * which would differ between engines/partitionings in the last ulp).
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Integer-valued doubles (e.g. l_quantity) are exactly summable. */
  def wholeUnits(c: Column): Column = c.cast("long")

  /** Discounted revenue in exact integer units: cents(price) ×
    * (100 − cents(discount)). Sums of this divide by 10000.0 to get the
    * dollar value. ONE definition shared by every revenue query — the
    * rounding idiom must never drift between copies.
    */
  def revenueUnits(price: Column, discount: Column): Column =
    cents(price) * (lit(100) - cents(discount))
}
