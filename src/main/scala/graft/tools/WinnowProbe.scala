package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Contamination, NearDup, TextAnalysis => TA}

/** Stage-by-stage timing for the winnowing pipeline — the diagnostic
  * that caught the unstaged-token O(len²) regression (explode+hash
  * 10.7 s → 0.9 s at sf0.1 after staging).
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[winnowprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("warm")(docs.count())
    t("explode+hash")(docs
      .select(col("doc_id"), TA.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), Contamination.ngrams(col("_tk"), 3).as("sh"))
      .select(col("doc_id"), posexplode(col("sh")).as(Seq("pos", "gstr")))
      .select(col("doc_id"), col("pos"),
        graft.functions.Hashing.h32(col("gstr")).as("h"))
      .queryExecution.toRdd.count())
    t("fingerprints")(NearDup.winnowFingerprints(docs, "doc_id",
        TA.tokens(col("text")), 3, 4)
      .queryExecution.toRdd.count())
    t("pairs")(NearDup.winnowPairs(docs, "doc_id",
        TA.tokens(col("text")), 3, 4, maxDf = 8, minShared = 2L)
      .queryExecution.toRdd.count())
    t("oov_bigrams_distinct")(docs
      .select(col("doc_id"),
        array_distinct(TA.charBigrams(col("text"))).as("bs"))
      .select(col("doc_id"), explode(col("bs")).as("b"))
      .queryExecution.toRdd.count())
    spark.stop()
  }
}
