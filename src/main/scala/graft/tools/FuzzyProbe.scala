package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic for FuzzyJoin blocking: reports prefix sizes, candidate
  * counts (pre- and post-positional filter), block-size distribution,
  * and stage wall times on the sf dir's customer table. Run:
  *   sbt "runMain graft.tools.FuzzyProbe /root/testdata/sf0.1"
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = args.lift(1).map(_.toInt).getOrElse(1)
    val q = args.lift(2).map(_.toInt).getOrElse(2)
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
      .withColumn("len", length(col("s")))
    val shortCut = q * (d + 1) - 1
    val prefixLen = q * d + 1

    val grams = df.where(col("len") > shortCut)
      .select(col("id"), col("s"), col("len"),
        posexplode(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> substring(s, i, $q))")))
      .select(col("id"), col("s"), col("len"),
        (col("pos") + 1).as("pos"), col("col").as("gram"))
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("freq"))
    println(s"rows=${df.count()} gramOcc=${grams.count()} gramVals=${freq.count()}")

    val w = Window.partitionBy("id").orderBy(col("freq"), col("gram"), col("pos"))
    val ranked = grams.join(broadcast(freq), "gram")
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= prefixLen)
    def minEdits(posArr: String): String =
      s"aggregate(array_sort($posArr), named_struct('c', 0, 'cov', -2147483647), " +
        s"(st, p) -> if(p > st.cov, named_struct('c', st.c + 1, 'cov', p + ${q - 1}), st)).c"
    val posOfFirstK: String => String = k =>
      s"transform(filter(_parr, x -> x._rk <= $k), x -> x.pos)"
    val kStar =
      s"array_min(filter(transform(sequence(${d + 1}, $prefixLen), " +
        s"k -> if(${minEdits(posOfFirstK("k"))} > $d, k, cast(null as int))), " +
        "v -> v is not null))"
    val prefix = ranked
      .withColumn("_parr", collect_list(struct(col("_rk"), col("pos")))
        .over(Window.partitionBy("id")))
      .withColumn("_k", coalesce(expr(kStar), lit(prefixLen)))
      .where(col("_rk") <= col("_k"))
      .select(col("gram"), col("pos"), col("id"), col("s"), col("len"))
      .cache()
    println(s"prefixRows=${prefix.count()} " +
      s"avgPerString=${prefix.count().toDouble / df.count()}")

    // value-only candidate count (the old blocking)
    val valueBlocks = prefix.select("gram", "id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("n"))
    valueBlocks.agg(sum(col("n") * (col("n") - 1) / 2).as("valueOnlyPairs"),
      max("n").as("maxValueBlock")).show()

    // positional blocks (gram, pos-bucket after explode)
    val bw = d + 1
    val t0 = System.nanoTime()
    val a = prefix
      .withColumn("bk", explode(expr(s"sequence(pos div $bw - 1, pos div $bw + 1)")))
      .repartition(32)
    val b = prefix.select(col("gram"), expr(s"pos div $bw").as("bk"),
      col("pos").as("pos2"), col("id").as("id2"),
      col("s").as("s2"), col("len").as("len2"))
    val joined = a.join(b, Seq("gram", "bk"))
      .where(col("id") < col("id2") &&
        abs(col("pos") - col("pos2")) <= d &&
        abs(col("len") - col("len2")) <= d)
    val nCand = joined.count()
    println(s"posFilteredCandOccPairs=$nCand " +
      f"joinCountWall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val nDistinct = joined.select("id", "id2").distinct().count()
    println(s"distinctCandPairs=$nDistinct " +
      f"wall=${(System.nanoTime() - t1) / 1e9}%.1f s")

    // raw join WITHOUT the positional predicate, to see the block sizes
    val blocks = b.groupBy("gram", "bk").agg(count(lit(1)).as("n"))
    blocks.orderBy(desc("n")).show(10, false)
    blocks.agg(sum(col("n") * col("n")).as("sumSq")).show()

    val t2 = System.nanoTime()
    val full = graft.ext.FuzzyJoin.selfPairs(
      spark.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_name"),
      "c_custkey", "c_name", d = 1)
    println(s"truePairs=${full.count()} " +
      f"fullWall=${(System.nanoTime() - t2) / 1e9}%.1f s")
    spark.stop()
  }
}
