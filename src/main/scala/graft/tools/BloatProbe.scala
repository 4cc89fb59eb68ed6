package graft.tools

import org.apache.spark.sql.SparkSession

import graft.wat.{WatExtract, WatFixture}

/** Throughput delta of realistic-envelope WAT records vs the lean
  * fixtures: real CC records are mostly metadata the extraction never
  * navigates (response headers, Head title/metas/scripts), while the
  * lean bench fixtures are nearly all Links — so lean-fixture records/s
  * overstates what a crawl run sees per byte, and this probe measures
  * the honest per-record cost of lexing-and-skipping the bloat
  * (WatPruningSpec pins that the OUTPUT is identical; this pins the
  * cost). One archive = one task, same DSv2 path as the bench queries;
  * min of `SPARK_GRAFT_BENCH_PASSES` (default 2) after a warm pass.
  */
object BloatProbe {
  def main(args: Array[String]): Unit = {
    val bloatUnits = args.lift(0).map(_.toInt).getOrElse(10)
    val (nFiles, nRecords, links) = WatFixture.BenchSingle
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lean = WatFixture.ensureBenchWats(nFiles, nRecords, links)
    val bloated = WatFixture.ensureBenchWats(nFiles, nRecords, links,
      bloatUnits = bloatUnits)
    def sizeMb(ps: Seq[String]) =
      ps.map(new java.io.File(_).length()).sum / 1e6

    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    def time(paths: Seq[String]): Double = {
      def run(): Long = WatExtract.fromPathsV2(spark, paths, "image_only")
        .toDF().queryExecution.toRdd.count()
      run() // warm: codegen + page cache
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val tLean = time(lean)
    val tBloat = time(bloated)
    println(f"""{"metric":"bloat_probe","records":${nFiles * nRecords},"bloat_units":$bloatUnits,"lean_mb":${sizeMb(lean)}%.1f,"bloat_mb":${sizeMb(bloated)}%.1f,"lean_sec":$tLean%.3f,"bloat_sec":$tBloat%.3f,"lean_rec_per_s":${nFiles * nRecords / tLean}%.0f,"bloat_rec_per_s":${nFiles * nRecords / tBloat}%.0f}""")
    spark.stop()
  }
}
