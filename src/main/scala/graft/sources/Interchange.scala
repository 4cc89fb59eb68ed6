package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interchange formats (CSV, ORC, file-per-doc text) with explicit
  * schemas — the ingest and export edges of the engine, complementing
  * the parquet core and
  * the JSONL source ([[Jsonl]]).
  *
  * Contract shared with Jsonl: the caller ALWAYS supplies the schema on
  * read (here: the writer's schema, since these are round-trip
  * helpers). Schema inference is a full extra pass over the bytes — at
  * 100 TB that is a second 100 TB scan before the first real one, so
  * the engine never infers.
  *
  * CSV is written RFC 4180-style (quoted fields, doubled-quote escape)
  * so any standards-compliant consumer can read the export; the read
  * side sets `multiLine` because quoted fields may carry embedded
  * newlines. multiLine costs CSV its line-level splittability (a record
  * boundary is no longer a newline), so gzip-style whole-file
  * parallelism applies: many files = the parallelism unit, exactly the
  * shard layout `coalesce`/`repartition` before the write controls.
  * ORC keeps columnar statistics, so filters on a read-back push into
  * the scan like parquet (pinned by InterchangeSpec).
  */
object Interchange {

  /** Land `df` as quoted CSV under `path`, then read it back with the
    * writer's schema. The round trip is the correctness contract:
    * embedded commas, quotes, and newlines must survive verbatim
    * (q_csv_roundtrip hash-checks that against DuckDB's independent
    * recomputation of the same content).
    *
    * Nulls ride the MySQL-dump sentinel `\N` so the EMPTY STRING
    * round-trips distinct from null (Spark's defaults read both back
    * as null — a silent edit of real data). The residual, pinned
    * lossiness is a payload that IS the literal 2-char string `\N`:
    * the univocity reader applies the null sentinel after unquoting,
    * so no quoting scheme can protect it — a strictly rarer casualty
    * than every empty string in the corpus.
    */
  def csvRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"") // RFC 4180: quotes escape by doubling
      // the CSV WRITER trims field edges by default (the read side
      // doesn't) — an export format must not edit the data
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", "\\N")
      .csv(path)
    df.sparkSession.read
      .schema(df.schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .csv(path)
  }

  /** Land `df` as ORC under `path` and read it back. */
  def orcRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }

  /** One-file-per-document text layout: each row of `df` lands as its
    * own plain `.txt` file under `path/<idCol>=<id>/` (the Pile-style
    * raw-dump shape — a corpus as a directory of files), then reads
    * back whole-file (`wholetext`) with the id recovered from the
    * partition directory. Returns (idCol long, textCol string).
    *
    * Losslessness: the text writer appends EXACTLY one `\n` per row
    * and each doc is one row in one file, so stripping exactly one
    * trailing newline on read restores every payload — including
    * payloads that already end in `\n` (write adds a second, strip
    * removes one) and embedded newlines (wholetext never splits).
    * q_text_files hash-checks this against the parquet original.
    *
    * Scale: whole-file reads parallelize per FILE — millions of small
    * files is the many-tasks/listing regime Compaction exists to fix;
    * this is the INGEST edge for corpora that arrive this way, not a
    * recommended at-rest layout.
    *
    * Precondition (inherited from QueryUtil.fanOut, whose partition
    * probe walks `df.rdd`): pass a SCAN-LEVEL, exchange-free `df`. A
    * post-shuffle frame would have its upstream query stages
    * materialized once by the probe and again by the write — callers
    * with derived frames should land them to storage first and pass
    * the re-read.
    */
  def textFilesRoundTrip(df: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame = {
    // fan the writer out (QueryUtil.fanOut): each row becomes its own
    // dynamic-partition directory, and the per-file open/flush/commit
    // overhead (~hundreds of ms each through the committer) serializes
    // onto one task when the input is a single-split scan — measured
    // 6.2 s single-task vs ~0.4 s fanned for 25 docs at sf0.1. At scale
    // a multi-split input skips the repartition entirely.
    graft.queries.QueryUtil.fanOut(
        df.select(col(idCol).cast("string").as(idCol),
          col(textCol).as("value")),
        idCol)
      .write.mode("overwrite").partitionBy(idCol).text(path)
    df.sparkSession.read
      .option("wholetext", "true")
      .text(path)
      .select(col(idCol).cast("long").as(idCol),
        // \z (absolute end), NOT $: Java's $ also matches before a
        // final line terminator and regexp_replace replaces ALL
        // matches, which would strip every trailing newline instead of
        // exactly the one the writer added
        regexp_replace(col("value"), "\\n\\z", "").as(textCol))
  }
}
