package graft.sources

import org.apache.spark.sql.DataFrame

/** Interchange formats (CSV, ORC) with explicit schemas — the ingest
  * and export edges of the engine, complementing the parquet core and
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
    */
  def csvRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"") // RFC 4180: quotes escape by doubling
      // the CSV WRITER trims field edges by default (the read side
      // doesn't) — an export format must not edit the data
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    df.sparkSession.read
      .schema(df.schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
  }

  /** Land `df` as ORC under `path` and read it back. */
  def orcRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }
}
