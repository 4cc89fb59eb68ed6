package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Boilerplate

/** Price the boilerplate strip's regex passes (VERDICT r10 task 5).
  *
  * History: the r10 form ran, per block, tag-replace (full block) →
  * whitespace-collapse (stripped text) → anchor extract_all (full
  * block). This probe measured the split-on-tag-pattern form (visible
  * segments in one scan, join + collapse + trim) byte-identical and
  * faster at both sf0.1 (0.80 → 0.55 s) and sf10 (3.06 → 2.80 s), so
  * [[Boilerplate]] now ships it; the retired replace+collapse form is
  * kept HERE as the comparison candidate so the trade stays re-priceable.
  *
  * Usage: `sbt "runMain graft.tools.BoilerplateProbe <sfDir> [passes]"`
  * — prints min-of-N wall seconds for each variant plus a result
  * fingerprint so a faster-but-different variant can't win.
  */
object BoilerplateProbe {

  /** The RETIRED r10 form: tags→space replace over the full block,
    * then a collapse pass over the same-length stripped copy. Kept as
    * the probe's comparison point for the shipped split-join form.
    */
  private def variantReplace(docs: DataFrame): DataFrame = {
    val scored = docs
      .select(col("doc_id"),
        posexplode(split(col("html"), Boilerplate.splitPattern()))
          .as(Seq("pos", "blk")))
      .select(col("doc_id"), col("pos"),
        trim(regexp_replace(
          regexp_replace(col("blk"), Boilerplate.TagPattern, " "),
          " +", " ")).as("btext"),
        length(array_join(
          regexp_extract_all(col("blk"), lit(Boilerplate.AnchorPattern),
            lit(1)), ""))
          .cast("long").as("link_chars"))
      .where(col("btext").isNotNull && col("btext") =!= "")
      .withColumn("tc", length(col("btext")).cast("long"))
      .withColumn("keep",
        col("tc") >= 10 &&
          col("link_chars") * 1000 < col("tc") * 400)
    scored.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("tc")).as("_total"),
        coalesce(sum(when(col("keep"), col("tc"))), lit(0L)).as("_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("btext"))))),
            s => s.getField("btext"))).as("clean_text"))
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        expr("(_total - _kept) * 1000 div _total").as("boiler_milli"),
        col("clean_text"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // same synthetic HTML wrap as q_boilerplate (nav + 25% ad + footer)
    val nav = "<html><head><title>d</title></head><body><nav>" +
      "<a href=\"/\">home</a> <a href=\"/a\">about</a> " +
      "<a href=\"/x\">links</a></nav><div>"
    val ad = "<div><a href=\"/b\">click now</a> <a href=\"/p\">buy</a></div>"
    val foot = "<footer><a href=\"/c\">contact</a> " +
      "<a href=\"/t\">terms</a> c 2026</footer></body></html>"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        concat(lit(nav), col("text"), lit("</div>"),
          when(pmod(col("doc_id"), lit(4)) === 0, lit(ad)).otherwise(lit("")),
          lit(foot)).as("html"))
      .persist()
    docs.count()

    def fingerprint(df: DataFrame): String =
      df.agg(md5(concat_ws("|",
        sort_array(collect_list(concat_ws(":", col("doc_id"),
          col("n_blocks"), col("n_kept"), col("boiler_milli"),
          md5(col("clean_text"))))))).as("fp"))
        .head().getString(0)

    def time(label: String, mk: => DataFrame): Unit = {
      mk.queryExecution.toRdd.count() // warm codegen
      val walls = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${walls.min}%.3f s  passes ${
        walls.map(w => f"$w%.3f").mkString(", ")}  fp ${fingerprint(mk)}")
    }

    time("shipped (split-join)",
      Boilerplate.extractMainContent(docs, "doc_id", "html"))
    time("retired (replace+collapse)", variantReplace(docs))
    spark.stop()
  }
}
