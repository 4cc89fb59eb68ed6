package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) table layout — the storage-side half of the
  * shuffle-minimization story. `df.write.bucketBy(n, key)` hash-splits
  * every output file by key at WRITE time; a later equi-join of two
  * tables bucketed on their join keys with the same bucket count needs
  * no exchange at all — Spark zips bucket i of the left with bucket i
  * of the right (`FileSourceScanExec` reports the bucket spec as its
  * `outputPartitioning`, so `EnsureRequirements` inserts no shuffle).
  *
  * At 100 TB this is the single biggest join lever the engine has: the
  * shuffle of the fact table is paid ONCE when the corpus lands, then
  * amortized over every downstream join and aggregation on that key —
  * repeated joins against a 100 TB lineage/dedup/metadata table become
  * local merge-zips per bucket instead of a full-cluster exchange per
  * query. `sortBy(key)` additionally lands each bucket file key-sorted
  * so a sort-merge join can stream it. Equality-on-key scans also prune
  * to one bucket (`SelectedBucketsCount: 1 out of n` in the scan) —
  * point-lookup cost drops by the bucket count with zero index
  * structure. Both behaviors are pinned by BucketingSpec.
  *
  * The reference has no storage-layout story (it writes flat parquet,
  * /root/reference/cc2dataset/main.py:383-391); this is a
  * beyond-reference capability, sibling to the IVF at-rest layout
  * (Similarity.writeAssignedPartitioned) and the Z-order range layout
  * (ZOrder) — three layouts trading one write-time shuffle for
  * shuffle-free/pruned reads forever after.
  */
object Bucketing {

  /** Land `df` as a managed parquet table hash-bucketed AND sorted on
    * `key`. Overwrite semantics so re-runs are idempotent. The bucket
    * count is a layout contract: every table that wants shuffle-free
    * joins against this one must use the SAME count (Spark only zips
    * equal bucket counts without an exchange).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // The default (in-memory) catalog forgets tables across JVMs but the
    // warehouse directory persists, so a re-run in a fresh session hits
    // LOCATION_ALREADY_EXISTS on the orphaned path. Clear it explicitly —
    // DROP TABLE above only removes a location the catalog still knows.
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Land the bucketed layout only if `table` is not already in the
    * catalog — the amortized-read contract: the write-time shuffle is
    * paid once per corpus, and every later join on the key reads the
    * layout for free. Callers that time the READ side (q_bucket_join_
    * read) use this so the layout lands in their first (warmup) pass
    * and the timed passes measure what a 100 TB consumer actually
    * pays: the exchange-free join alone.
    */
  def ensureBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writeBucketed(df, table, key, buckets)

  /** Equi-join two bucketed tables on their (differently-named) bucket
    * keys. `hint("merge")` pins the sort-merge strategy so the plan
    * demonstrates the layout's guarantee — zero exchanges — rather than
    * letting the planner broadcast a side that happens to be small at
    * test scale (at 100 TB neither side of a fact-fact join broadcasts,
    * so SMJ-without-exchange IS the production plan).
    */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
