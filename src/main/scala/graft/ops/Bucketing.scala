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
    // ONE FILE PER BUCKET, deliberately: repartition(buckets, key) uses
    // the same Murmur3 HashPartitioning the bucket spec uses, so each
    // write task holds exactly one bucket's rows and each bucket lands
    // as a single key-sorted file. Scans only report a bucket's sort
    // order when it has at most one file — with the default task-count
    // layout (up to one file per task per bucket) every downstream SMJ
    // RE-SORTS both sides at read time, silently re-paying at every
    // query the cost the layout exists to amortize (measured at ×100:
    // 9.2 GB of read-side sort spill per join — zero after this).
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
    // stamp the layout's contract beside its files: registration after
    // a JVM restart must be able to PROVE the on-disk bytes were written
    // under the same (key, buckets) it is about to declare
    val fs2 = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs2.create(new org.apache.hadoop.fs.Path(p, SpecMarker), true)
    try out.write(specLine(key, buckets).getBytes("UTF-8"))
    finally out.close()
  }

  /** Contract marker written beside a completed layout's files. */
  private val SpecMarker = "_GRAFT_BUCKET_SPEC"

  private def specLine(key: String, buckets: Int): String =
    s"key=$key buckets=$buckets v=1\n"

  /** Bucket ids named by the files of an on-disk bucketed layout —
    * Spark's writer suffixes every bucketed part file with the 5-digit
    * bucket id (`part-...-<uuid>_00003.c000.snappy.parquet`).
    */
  private val BucketIdInName = raw"_(\d{5})\.c\d+".r

  /** True iff the completed layout at `p` provably matches the declared
    * contract: its [[SpecMarker]] records the SAME (key, buckets) — a
    * 4-bucket layout re-declared as 8 buckets hashes keys mod the wrong
    * count, and its file NAMES (ids 0-3, one each) look valid, so the
    * written contract is the only honest witness — and the file set is
    * name-consistent (every id < buckets, at most one file per bucket:
    * the sort-trust contract — scans only honor write-time order on
    * single-file buckets). A stale or differently-specced layout fails
    * here and is REWRITTEN instead of silently served misbucketed: a
    * bucketed SMJ over wrong bucket hashing returns wrong join rows,
    * and a timing-only Bench pass would publish them with no oracle
    * running. Pre-marker layouts (no spec file) fail too — rewrite is
    * the safe default.
    */
  private def layoutMatches(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, key: String, buckets: Int): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(p, SpecMarker)
    if (!fs.exists(marker)) return false
    val recorded = {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    if (recorded != specLine(key, buckets)) return false
    val ids = fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && !n.endsWith(".crc"))
      .flatMap(n => BucketIdInName.findFirstMatchIn(n).map(_.group(1).toInt))
    ids.nonEmpty && ids.forall(_ < buckets) &&
      ids.groupBy(identity).valuesIterator.forall(_.size == 1)
  }

  /** Land the bucketed layout only if it does not already exist — the
    * amortized-read contract: the write-time shuffle is paid once per
    * CORPUS, not once per session. Three cases, cheapest first:
    * already cataloged → no-op; layout files on disk but the (default
    * in-memory) catalog forgot them across a JVM restart → REGISTER
    * the existing files as a bucketed table (CREATE TABLE ... CLUSTERED
    * BY ... LOCATION — a metadata-only statement; without this every
    * fresh JVM would re-pay the full double write); nothing on disk →
    * write. Callers that time the READ side (q_bucket_join_read) get
    * timed passes that measure what a 100 TB consumer actually pays:
    * the exchange-free join alone.
    *
    * Registration VALIDATES before declaring ([[layoutMatches]]): the
    * layout's written [[SpecMarker]] must record the same (key,
    * buckets), and the file set must name only bucket ids under the
    * declared count, one file per bucket. A stale, pre-marker, or
    * differently-specced layout is rewritten, never registered — the
    * caller still owns the schema, which bytes cannot witness.
    */
  /** True iff the CATALOG's record of `table` declares exactly the
    * requested (key, buckets) bucket spec — the catalog-side twin of
    * [[layoutMatches]]. Without this, a re-declare at a different width
    * in the same JVM (or via a shared durable metastore — the
    * MetastoreProbe deployment) would short-circuit on `tableExists`
    * and silently serve the OLD layout, defeating the exchange-free
    * contract the disk-side SpecMarker validation protects.
    */
  private def catalogSpecMatches(spark: SparkSession, table: String,
      key: String, buckets: Int): Boolean =
    try {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      // sortColumnNames is part of the contract too: writeBucketed's
      // exchange-free join also elides the SORT via sortBy(key), so a
      // table bucketed right but sorted differently (or not at all)
      // must be rewritten. Catalog identifiers are case-insensitive —
      // compare likewise. A lookup failure (e.g. `table` resolves to a
      // temp view, which tableExists reports but getTableMetadata
      // rejects) is a spec mismatch, not an error.
      val want = Seq(key.toLowerCase(java.util.Locale.ROOT))
      def norm(names: Seq[String]) =
        names.map(_.toLowerCase(java.util.Locale.ROOT))
      meta.bucketSpec.exists(bs =>
        bs.numBuckets == buckets &&
          norm(bs.bucketColumnNames) == want &&
          norm(bs.sortColumnNames) == want)
    } catch { case _: Exception => false }

  def ensureBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) {
      if (catalogSpecMatches(spark, table, key, buckets)) return
      // cataloged under a DIFFERENT spec: rewrite — writeBucketed drops
      // the stale table and its files first
      writeBucketed(df, table, key, buckets)
      return
    }
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) &&
        layoutMatches(fs, p, key, buckets)) {
      val cols = df.schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(
        s"CREATE TABLE `$table` ($cols) USING parquet " +
          s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS " +
          s"LOCATION '$p'")
    } else writeBucketed(df, table, key, buckets)
  }

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
