package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftFunctions

/** Session construction (N1/N2, SURVEY.md §2.11): a local builder for
  * tests/dev and a cluster builder carrying the throughput configuration a
  * Common-Crawl-scale job needs — re-expressed from public Spark/Hadoop
  * documentation (hadoop-aws S3A performance options, Spark AQE/Kryo
  * tuning), mirroring what the reference tunes by hand
  * (cc2dataset/spark_session_builder.py:29-75).
  */
object SessionBuilder {

  /** Optimizer rules excluded in every graft session.
    *
    * InferFiltersFromGenerate synthesizes `size(e) > 0 AND isnotnull(e)`
    * below each explode/posexplode and pushes it toward the scan with
    * the GENERATOR EXPRESSION INLINED. Our generators are expensive
    * per-row expressions over document text (tokenization, shingling,
    * char-split), so the "free" inferred filter re-evaluates the whole
    * expression a second time — below any fan-out exchange, i.e. on the
    * single scan task (the r10 alias-substitution class; six operators
    * already carry per-site workarounds — hash-after-explode,
    * posexplode_outer). The rule's upside is skipping rows whose array
    * is empty, which explode drops anyway and which parquet cannot use
    * as a pushed filter (no size() predicate support) — measured ~0 for
    * every operator here, against a measured +1.2 s per affected query
    * at sf0.1. Scale-independent: plan shape only, identical results.
    */
  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      memGb: Int = 8, appName: String = "graft"): SparkSession =
    withGraftFunctions(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.driver.memory", s"${memGb}g")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules", ExcludedOptimizerRules)
      // battery-sized generated-class cache — see Bench.scala rationale
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // trust the write-time bucket sort on read (safe: Spark still
      // re-sorts any bucket with more than one file; Bucketing writes
      // exactly one sorted file per bucket so SMJs stream sort-free)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  /** Cluster session for wide WAT-extraction jobs. Key choices:
    *  - task.maxFailures=10: flaky-fetch tolerance in depth (paired with
    *    the in-task retry in WatReader)
    *  - 4000 shuffle partitions as the pre-AQE ceiling; AQE coalesces
    *    down at runtime instead of hand-tuning per job
    *  - Kryo for the DocLink-heavy shuffles
    *  - S3A: connection pool + thread pool sized for whole-file GETs,
    *    sequential fadvise (we read WATs front-to-back), fast multipart
    *    upload for the parquet commit
    */
  def cluster(master: String, executorCores: Int = 128,
      executorMemGb: Int = 240, appName: String = "graft"): SparkSession =
    withGraftFunctions(SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.executor.cores", executorCores.toString)
      .config("spark.executor.memory", s"${executorMemGb}g")
      .config("spark.task.maxFailures", "10")
      .config("spark.sql.shuffle.partitions", "4000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.excludedRules", ExcludedOptimizerRules)
      // battery-sized generated-class cache — see Bench.scala rationale
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // trust the write-time bucket sort on read (safe: Spark still
      // re-sorts any bucket with more than one file; Bucketing writes
      // exactly one sorted file per bucket so SMJs stream sort-free)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.hadoop.fs.s3a.connection.maximum", "2048")
      .config("spark.hadoop.fs.s3a.threads.max", "512")
      .config("spark.hadoop.fs.s3a.experimental.input.fadvise", "sequential")
      .config("spark.hadoop.fs.s3a.fast.upload", "true")
      .config("spark.hadoop.fs.s3a.multipart.size", "64M")
      .config("spark.hadoop.fs.s3a.block.size", "128M")
      .getOrCreate())

  def withGraftFunctions(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    spark
  }
}
