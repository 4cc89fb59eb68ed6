package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency sketches. [[MisraGries]] is the classic deterministic
  * heavy-hitters summary (Misra & Gries 1982) in its MERGEABLE form
  * (Agarwal et al., "Mergeable Summaries", PODS 2012): a capacity-m
  * map of (item → undercount). Guarantee: after summarizing a stream of
  * n items, every item with true count > n/(m+1) is present in the
  * summary — and the guarantee survives arbitrary partitioning + merge,
  * which is exactly Spark's partial/final aggregation contract.
  *
  * [[Sketches.heavyHitters]] composes the sketch with an exact recount:
  * sketch → candidate set (≤ m items, broadcast) → one equi-join +
  * exact count of candidates only → threshold filter. The final output
  * is therefore EXACTLY the set of items with count × (m+1) > n — the
  * sketch only bounds how much work the recount does (m items instead
  * of the full vocabulary), so results are deterministic and
  * oracle-checkable while the full-vocabulary aggregation never runs.
  *
  * 100 TB design: the sketch pass is one combinable aggregation whose
  * buffer is ≤ m entries regardless of vocabulary size (the whole point
  * — a full groupBy(token) at corpus scale shuffles the vocabulary; the
  * sketch shuffles m entries per partition). The recount joins the
  * corpus against a BROADCAST ≤ m-row candidate list, then aggregates
  * ≤ m groups; the 1-row total is broadcast (BNLJ by intent, the
  * q_ann_recall pattern).
  */
object Sketches {

  /** Mergeable Misra-Gries heavy-hitters summary over string items.
    * Buffer: item → count, at most m entries. reduce: increment if
    * present; insert if room; else decrement every counter (dropping
    * zeros) — the classic m-way cancellation. merge: pointwise sum,
    * then shrink back to m by subtracting the (m+1)-th largest count
    * (Agarwal et al. §3.1 — preserves the undercount-by-at-most-n/(m+1)
    * bound).
    */
  class MisraGries(m: Int)
      extends Aggregator[String, Map[String, Long], Array[String]] {
    require(m >= 1, s"capacity must be >= 1, got $m")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1)
        case None if buf.size < m => buf.updated(item, 1L)
        case None =>
          // decrement-all: cancels one occurrence of m+1 distinct items
          buf.iterator
            .map { case (k, c) => (k, c - 1) }
            .filter(_._2 > 0)
            .toMap
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (sum.size <= m) sum
      else {
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
        sum.iterator
          .map { case (k, c) => (k, c - cut) }
          .filter(_._2 > 0)
          .toMap
      }
    }

    override def finish(buf: Map[String, Long]): Array[String] =
      buf.keysIterator.toArray.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Exactly the items whose count × (m+1) exceeds the stream length,
    * computed without a full-vocabulary aggregation (see object doc).
    * `items` must be a single-string-column frame; null items are
    * ignored (they can never be reported — a null key carries no text).
    * Output: (item, n) — deterministic, exact.
    */
  def heavyHitters(items: DataFrame, m: Int): DataFrame = {
    val itemCol = items.columns match {
      case Array(c) => c
      case cs => throw new IllegalArgumentException(
        s"heavyHitters expects one column, got ${cs.mkString(",")}")
    }
    val stream = items.where(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("item"))
    // sketch AND stream length in ONE aggregation over ONE scan
    // (DESIGN.md rule 8: never re-scan for something a pass already
    // knows); the 1-row result explodes into a <= m-row broadcast
    // carrying the total, so the recount join is a plain broadcast
    // HASH join on the item key — no BNLJ anywhere
    val mg = udaf(new MisraGries(m),
      org.apache.spark.sql.Encoders.STRING)
    val candTotal = stream
      .agg(mg(col("item")).as("cand"), count(lit(1)).as("n_total"))
      .select(explode(col("cand")).as("item"), col("n_total"))
    stream.join(broadcast(candTotal), "item")
      .groupBy("item")
      .agg(count(lit(1)).as("n"), min("n_total").as("n_total"))
      .where(col("n") * (m + 1) > col("n_total"))
      .select(col("item"), col("n"))
  }
}
