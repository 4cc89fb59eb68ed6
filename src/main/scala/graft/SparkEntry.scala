package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtQueries, IoQueries, RefQueries, RelQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator battery (reference parity + relational
  * capability + LLM-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for every hash-checkable query (queries whose semantics is
  * row order or partitioning get a rows-only check by omission).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ RelQueries.queries ++ ExtQueries.queries ++
      StreamQueries.queries ++ IoQueries.queries

  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ RelQueries.oracle ++ ExtQueries.oracle ++
      StreamQueries.oracle ++ IoQueries.oracle
}
