package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output shuffling / partitioning (cc2dataset/main.py:258-260).
  *
  * O1 `sort(rand())` is a global sort on a random key: Spark samples the
  * key range, range-partitions, then sorts per partition — two stages, no
  * single-node bottleneck, scales linearly. Seedable for tests (the
  * reference's unseeded rand at main.py:259 is nondeterministic).
  *
  * O2 `repartition(max(256, watCount/500))` round-robins into a bounded
  * file count — same formula as cc2dataset/main.py:260.
  */
object Shuffle {

  def randomShuffle(df: DataFrame, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed))

  def outputPartitions(watCount: Int): Int = math.max(256, watCount / 500)

  def repartitionForOutput(df: DataFrame, watCount: Int): DataFrame =
    df.repartition(outputPartitions(watCount))
}
