package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Contamination, TextAnalysis => TA}
object WinnowProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p2] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    def staged = docs.select(col("doc_id"), TA.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), Contamination.ngrams(col("_tk"), 3).as("sh"))
    t("warm")(docs.count())
    println("[p2] input partitions = " + docs.rdd.getNumPartitions)
    t("explode 1-part")(staged.select(col("doc_id"), explode(col("sh")).as("g")).queryExecution.toRdd.count())
    t("explode repart32")(docs.repartition(32)
      .select(col("doc_id"), TA.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), Contamination.ngrams(col("_tk"), 3).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("g")).queryExecution.toRdd.count())
    t("explode cheap-array")(docs.repartition(32)
      .select(col("doc_id"), TA.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), transform(sequence(lit(1), size(col("_tk"))), i => i).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("g")).queryExecution.toRdd.count())
    t("explode zipwith-grams")(docs.repartition(32)
      .select(col("doc_id"), TA.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), zip_with(
          slice(col("_tk"), lit(1), size(col("_tk")) - 2),
          zip_with(slice(col("_tk"), lit(2), size(col("_tk")) - 2),
                   slice(col("_tk"), lit(3), size(col("_tk")) - 2),
            (b, c) => concat(b, lit(" "), c)),
          (a, bc) => concat(a, lit(" "), bc)).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("g")).queryExecution.toRdd.count())
    spark.stop()
  }
}
