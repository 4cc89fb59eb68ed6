package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The fixture generator has shipped `events.ts` in two physical shapes
  * across rounds: parquet TIMESTAMP(NANOS) (readable only as a nanos
  * long via the legacy conf) and native TIMESTAMP(MICROS)
  * (isAdjustedToUTC=false → TIMESTAMP_NTZ). Round 8's bench died on the
  * switch because the loader assumed the nanos-long vintage
  * unconditionally. This spec pins `QueryUtil.normalizeTs` on all three
  * arrival types — nanos long, NTZ, and TimestampType — asserting each
  * lands on the SAME TimestampType instants, so the next generator
  * change degrades to a per-query failure instead of killing the run.
  */
class EventsVintageSpec extends AnyFunSuite with SparkTestBase {

  // one instant, expressed per vintage: 2024-03-01T12:34:56.789012 UTC
  private val micros = 1709296496789012L

  test("nanos-long vintage: integer div lands on exact micros") {
    val df = spark.range(1).select((lit(micros) * 1000L).as("ts"))
    val out = QueryUtil.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros)
  }

  test("nanos-long vintage: sub-microsecond nanos truncate, not round") {
    // 999 ns above the instant must floor back to it (DuckDB's
    // ts::TIMESTAMP truncates ns→µs the same way)
    val df = spark.range(1).select((lit(micros) * 1000L + 999L).as("ts"))
    val got = QueryUtil.normalizeTs(df)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros)
  }

  test("TIMESTAMP_NTZ vintage: cast is value-preserving under UTC session") {
    val df = spark.range(1)
      .select(timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = QueryUtil.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros)
  }

  test("TimestampType vintage: pass-through identity") {
    val df = spark.range(1).select(timestamp_micros(lit(micros)).as("ts"))
    val out = QueryUtil.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros)
  }

  test("all three vintages agree on the rendered instant") {
    val renders = Seq(
      spark.range(1).select((lit(micros) * 1000L).as("ts")),
      spark.range(1)
        .select(timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts")),
      spark.range(1).select(timestamp_micros(lit(micros)).as("ts"))
    ).map { df =>
      QueryUtil.normalizeTs(df)
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .head().getString(0)
    }
    assert(renders.distinct == Seq("2024-03-01 12:34:56.789012"))
  }
}
