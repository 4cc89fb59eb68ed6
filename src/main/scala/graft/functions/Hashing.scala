package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashes.
  *
  * `h32` = first 8 hex chars of md5, as a bigint in [0, 2^32) — chosen
  * because it is expressible identically in Spark (`conv(substring(md5(x),
  * 1,8),16,10)`) and in the DuckDB oracle (`('0x'||substr(md5(x),1,8))::
  * BIGINT`), so every hash-derived operator (MinHash, SimHash,
  * fingerprints) stays exactly checkable. All builtins → whole-stage
  * codegen keeps these in the generated loop.
  */
object Hashing {

  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: independent hash family member i (prefix-salted). */
  def h32Seeded(i: Int, c: Column): Column = h32(concat(lit(s"$i|"), c))

  /** DuckDB oracle fragment for h32. */
  def h32Sql(expr: String): String = s"('0x'||substr(md5($expr),1,8))::BIGINT"

  def h32SeededSql(i: Int, expr: String): String = h32Sql(s"'$i|' || $expr")
}
