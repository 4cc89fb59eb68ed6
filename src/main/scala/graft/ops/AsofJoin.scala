package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the most recent right row at or
  * before it" — composed from existing operators instead of an
  * inequality join: union both sides, ONE window over (key, time), and
  * `last(..., ignoreNulls)` carries the latest right payload forward to
  * each left row.
  *
  * This is the shape that survives 100 TB: one hash shuffle on the key
  * plus a sort — the naive formulation (`l JOIN r ON l.key = r.key AND
  * r.ts <= l.ts` + max-per-group) explodes into per-key cross products
  * before aggregation, and Spark would execute an un-equi variant as a
  * broadcast nested-loop join.
  *
  * Tie semantics (deterministic, mirrored by the oracle): a right row
  * at exactly left.ts matches (right sorts before left at equal ts);
  * among several right rows at the same ts the one with the highest
  * `tieBreak` value wins.
  */
object AsofJoin {

  /** @param rightPayload right-side columns carried onto each left row
    *                     (null when no right row precedes it); names
    *                     must not clash with left columns
    * @param tieBreak     right-side unique column ordering equal-ts
    *                     right rows (highest wins) — must be one of
    *                     rightPayload
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String], tieBreak: String): DataFrame = {
    require(rightPayload.contains(tieBreak),
      s"tieBreak $tieBreak must be one of the right payload columns")
    val leftCols = left.columns.toSeq
    require(rightPayload.forall(!leftCols.contains(_)),
      "right payload columns must not clash with left columns")
    // withColumn would silently OVERWRITE an input column with one of
    // these names and corrupt the result — fail loudly instead
    val reserved = Set("_is_left", "_payload", "_asof")
    val clashes = (leftCols ++ right.columns).filter(reserved)
    require(clashes.isEmpty,
      s"input columns ${clashes.mkString(", ")} clash with internal " +
        "working columns (_is_left, _payload, _asof) — rename them first")
    // The payload rides as ONE struct (null only on left rows), and a
    // single last(ignoreNulls) carries it — carrying each column
    // independently would mix columns from different right rows whenever
    // a payload value is legitimately null (the later row's null column
    // would be "filled" from an earlier row).
    val l = left.withColumn("_is_left", lit(1))
    // a null-ts right row matches NOTHING: Spark's asc ordering is
    // nulls-first, so without this filter its payload would be carried
    // into every left row that has no real predecessor (and the engines'
    // opposite null-ordering defaults would diverge)
    val r = right.where(col(ts).isNotNull)
      .select(col(key), col(ts),
        struct(rightPayload.map(col): _*).as("_payload"))
      .withColumn("_is_left", lit(0))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_is_left").asc,
        col(s"_payload.$tieBreak").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_is_left") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
