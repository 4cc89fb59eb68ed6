package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Packing, TextAnalysis => TA}
import graft.ops.{Bucketing, Compaction}
import graft.sources.Interchange

/** Storage-layout, interchange, and packing queries: the bucketed
  * (pre-shuffled) join, the CSV/ORC round trips, small-file
  * compaction, and fixed-length sequence packing — each oracle-checked
  * against DuckDB's independent computation over the same parquet
  * fixtures.
  *
  * Scale story, shared by all: they price the WRITE-side choices a
  * 100 TB corpus must make once — bucket the fact tables on the join
  * key so every later join skips its exchange (Bucketing), export/
  * ingest through explicit-schema interchange formats without a
  * schema-inference scan (Interchange), keep file granularity at the
  * scan sweet spot (Compaction), and lay the token stream out into
  * training sequences with a collect-free distributed prefix sum
  * (Packing).
  */
object IoQueries {

  import QueryUtil.table

  /** Content that breaks naive CSV writers, synthesized identically on
    * both engines (the q_redact/q_boilerplate fixture pattern): an
    * embedded comma, a double quote, a backslash, and a newline, glued
    * to the first 50 chars of the fixture text. The Spark pipeline must
    * round-trip it through actual CSV bytes; DuckDB just recomputes the
    * expected value from parquet — so any quoting/escaping defect in
    * the write-read pair lands as a hash mismatch.
    */
  private val csvHostile: org.apache.spark.sql.Column =
    concat(lit("a,\"b\\c\"\n"), substring(col("text"), 1, 50))
  private val csvHostileSql: String =
    """'a,"b\c"' || chr(10) || substr(text, 1, 50)"""

  // DuckDB analog of TA.tokens (the ExtQueries convention)
  private val tokensSql = "string_split(text, ' ')"

  // fixed per-tag scratch path (process-scoped, QueryUtil.processScratch),
  // not a fresh temp dir per invocation: every writer below is
  // mode("overwrite"), so reuse keeps repeated battery passes at ONE
  // corpus copy per query instead of leaking a trail of snapshots
  private def tmpDir(tag: String): String = QueryUtil.scratchPath(s"io/$tag")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fact-fact equi-join with the shuffle paid at WRITE time: both
    // sides land hash-bucketed+sorted on the join key, the join itself
    // plans exchange-free (BucketingSpec pins the plan), and only the
    // bounded 5-key priority rollup shuffles. The timed cost here is
    // write + join — the honest price of the layout; at 100 TB the
    // write amortizes over every downstream join on the key.
    "q_bucket_join" -> ((s, dir) => {
      Bucketing.writeBucketed(
        table(s, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "graft_bj_li", "l_orderkey", 8)
      Bucketing.writeBucketed(
        table(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        "graft_bj_or", "o_orderkey", 8)
      Bucketing.bucketedEquiJoin(s, "graft_bj_li", "graft_bj_or",
          "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(QueryUtil.cents(col("l_extendedprice"))) / 100.0)
            .as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // The same join with the layout AMORTIZED: the bucketed tables are
    // created only if absent (first/warmup pass), so the timed passes
    // price what a 100 TB consumer pays on every query against an
    // already-bucketed corpus — the exchange-free SMJ and the bounded
    // rollup alone, no write. Table names are keyed by the sf dir so a
    // layout from one scale never serves another.
    "q_bucket_join_read" -> ((s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      Bucketing.ensureBucketed(
        table(s, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        s"graft_bjr_li_$tag", "l_orderkey", 8)
      Bucketing.ensureBucketed(
        table(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        s"graft_bjr_or_$tag", "o_orderkey", 8)
      Bucketing.bucketedEquiJoin(s, s"graft_bjr_li_$tag",
          s"graft_bjr_or_$tag", "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(QueryUtil.cents(col("l_extendedprice"))) / 100.0)
            .as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // RFC 4180 CSV round trip over hostile content (embedded comma,
    // quote, backslash, newline) — Spark writes real CSV bytes and
    // reads them back; DuckDB recomputes the expected frame from
    // parquet, so the hash check proves byte-faithful quoting.
    "q_csv_roundtrip" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), csvHostile.as("text"), col("lang"),
          col("n_chars"))
      Interchange.csvRoundTrip(docs, s"${tmpDir("csv")}/docs")
        .orderBy("doc_id")
    }),

    // ORC round trip: documents land as ORC, read back with the
    // writer's schema, and the post-read filter pushes into the ORC
    // scan (InterchangeSpec pins the pushdown) — the columnar
    // interchange edge behaves like the parquet core.
    "q_orc_roundtrip" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      Interchange.orcRoundTrip(docs, s"${tmpDir("orc")}/docs")
        .where(col("n_chars") > 200)
        .orderBy("doc_id")
    }),

    // Fixed-length sequence packing: concatenate docs in doc_id order,
    // cut every 512 tokens, report each doc's global token offset and
    // the sequence span it lands in. The prefix sum underneath is the
    // collect-free two-level scan (range buckets + bounded offset
    // window) — DuckDB recomputes it as one global window, so the hash
    // match proves the distributed scan is EXACT, not approximate.
    "q_pack_sequences" -> ((s, dir) => {
      Packing.packSequences(
          table(s, dir, "documents").select("doc_id", "text"),
          "doc_id", TA.tokenCount(col("text")), seqLen = 512, buckets = 16)
        .select("doc_id", "n_tokens", "start_off", "first_seq", "last_seq")
        .orderBy("doc_id")
    }),

    // Packing audit rolled up from the same spans: per sequence-span
    // width (0 = fits one sequence, k = crosses k boundaries), how many
    // docs and tokens. The downstream masking/shard-sizing consumer's
    // first question, and a second independent check of the prefix sum.
    "q_pack_stats" -> ((s, dir) => {
      Packing.packSequences(
          table(s, dir, "documents").select("doc_id", "text"),
          "doc_id", TA.tokenCount(col("text")), seqLen = 512, buckets = 16)
        .groupBy((col("last_seq") - col("first_seq")).as("spans"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("spans")
    }),

    // Small-file compaction round trip: shatter documents into 32
    // undersized files, compact back to ~target size (coalesce — no
    // shuffle, pinned by CompactionSpec), and hash-check the surviving
    // content against the original parquet.
    "q_compact" -> ((s, dir) => {
      val base = tmpDir("compact")
      table(s, dir, "documents").repartition(32)
        .write.mode("overwrite").parquet(s"$base/shattered")
      val stats = Compaction.compact(s, s"$base/shattered",
        s"$base/compacted", targetBytes = 512L * 1024 * 1024)
      require(stats.filesAfter == 1 && stats.filesAfter < stats.filesBefore,
        s"expected single-file compaction, got $stats")
      s.read.parquet(s"$base/compacted")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // File-per-document text ingest (the Pile-style raw-dump shape):
    // every 20th doc lands as its own .txt file and reads back
    // whole-file; the strip-one-trailing-newline contract makes the
    // trip lossless for any payload (incl. embedded + trailing
    // newlines — InterchangeSpec pins both), proven by the hash match
    // against the parquet original.
    "q_text_files" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(20)) === 0)
        .select("doc_id", "text")
      Interchange.textFilesRoundTrip(docs, "doc_id", "text",
          s"${tmpDir("txt")}/docs")
        .orderBy("doc_id")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_bucket_join" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_items,
        |  sum(round(l_extendedprice*100)::BIGINT) / 100.0 AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_bucket_join_read" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_items,
        |  sum(round(l_extendedprice*100)::BIGINT) / 100.0 AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_csv_roundtrip" ->
      s"""SELECT doc_id, $csvHostileSql AS text, lang, n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents WHERE n_chars > 200 ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, len($tokensSql)::BIGINT AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0)::BIGINT AS start_off
         |  FROM t WHERE n_tokens > 0
         |)
         |SELECT doc_id, n_tokens, start_off,
         |  (start_off // 512)::BIGINT AS first_seq,
         |  ((start_off + n_tokens - 1) // 512)::BIGINT AS last_seq
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_pack_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id, len($tokensSql)::BIGINT AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0)::BIGINT AS start_off
         |  FROM t WHERE n_tokens > 0
         |)
         |SELECT (((start_off + n_tokens - 1) // 512)
         |          - (start_off // 512))::BIGINT AS spans,
         |  count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
         |FROM c GROUP BY 1 ORDER BY spans""".stripMargin,
    "q_compact" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_files" ->
      """SELECT doc_id, text FROM documents
        |WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin
  )
}
