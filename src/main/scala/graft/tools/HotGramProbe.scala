package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Contamination, TextAnalysis => TA}
import graft.functions.Hashing

/** Stage-level bisection of the hot-key slowdown the round-9 probe
  * found in the bigram operators (q_surprisal / q_collocations /
  * q_dup_spans ran 4-14× their uniform-fixture walls on the
  * boilerplate corpus): times each pipeline stage in isolation so the
  * blowup attributes to a STAGE, not a query.
  *
  * Usage: runMain graft.tools.HotGramProbe [dir]
  */
object HotGramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1_hot")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      // warm once, then min of 2
      df.queryExecution.toRdd.count()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hotgram] $name%-28s ${ts.min}%8.2f s")
    }

    val toks = TA.tokens(col("text"))

    time("scan+tokens") {
      docs.select(col("doc_id"), size(toks).as("n"))
    }
    time("bigram explode") {
      docs.where(col("doc_id").isNotNull)
        .select(col("doc_id"), posexplode(Contamination.ngrams(toks, 2)))
    }
    time("explode+h32x2") {
      docs.where(col("doc_id").isNotNull)
        .select(col("doc_id"), posexplode(Contamination.ngrams(toks, 2)))
        .select(col("doc_id"), Hashing.h32(col("col")).as("bgh"),
          Hashing.h32(substring_index(col("col"), " ", 1)).as("w1h"))
    }
    time("pair agg (hashed)") {
      docs.where(col("doc_id").isNotNull)
        .select(posexplode(Contamination.ngrams(toks, 2)))
        .select(Hashing.h32(col("col")).as("bgh"),
          Hashing.h32(substring_index(col("col"), " ", 1)).as("w1h"))
        .groupBy("bgh", "w1h").agg(count(lit(1)).as("c"))
    }
    time("pair agg (text keys)") {
      docs.where(col("doc_id").isNotNull)
        .select(explode(Contamination.ngrams(toks, 2)).as("bigram"))
        .select(col("bigram"),
          substring_index(col("bigram"), " ", 1).as("w1"),
          substring_index(col("bigram"), " ", -1).as("w2"))
        .groupBy("bigram", "w1", "w2").agg(count(lit(1)).as("c"))
    }
    time("full q_surprisal") {
      graft.ext.LanguageModel.bigramSurprisal(docs, "doc_id", toks)
    }
    time("full q_collocations") {
      graft.ext.LanguageModel.collocations(docs, "doc_id", toks)
    }
    time("5gram starts+occ join") {
      graft.ext.SubstringDedup.duplicatedStarts(docs, "doc_id", toks, 5, 2)
    }
    time("full q_dup_spans") {
      graft.ext.SubstringDedup.duplicatedSpans(docs, "doc_id", toks, 5, 2)
    }
    spark.stop()
  }
}
