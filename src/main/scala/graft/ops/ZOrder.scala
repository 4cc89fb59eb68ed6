package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data-skipping
  * layout — the public technique behind Delta/Iceberg OPTIMIZE ZORDER:
  * sort (or range-partition) the corpus by the bit-interleaved key and
  * every file's min/max column statistics become tight boxes in ALL
  * interleaved dimensions at once, so a scan with predicates on any of
  * them prunes files — a 1-D sort gives tight stats on one column only.
  *
  * The interleave is a pure integer expression (shifts/and/or) — it
  * stays inside whole-stage codegen and is expressible verbatim in the
  * DuckDB oracle. At 100 TB the layout pass is one range-repartition on
  * z (a single shuffle at write time, amortized over every subsequent
  * pruned scan), exactly the bucketed-write trade (BucketingSpec).
  */
object ZOrder {

  /** 2-D Morton code: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Inputs must be non-negative; only the low `bits` bits
    * participate (callers quantize into range first). bits <= 31 keeps
    * the result in a positive long.
    */
  def interleave2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** DuckDB oracle fragment computing exactly [[interleave2]]. */
  def interleave2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Layout pass: range-partition by the z-value into `numFiles`
    * output tasks and sort within each — one shuffle, clustered files.
    * (The write itself is the caller's; this returns the laid-out
    * frame so it composes with any sink.)
    */
  def zOrdered(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = interleave2(x, y, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
