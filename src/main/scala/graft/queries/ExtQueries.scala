package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline extension battery (dedup variants, similarity search,
  * text analysis, multimodal) — filled in as graft.ext lands.
  */
object ExtQueries {

  import RefQueries.QueryFn

  val queries: Map[String, QueryFn] = Map()

  val oracle: Map[String, String] = Map()
}
