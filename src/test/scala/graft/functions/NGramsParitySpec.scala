package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ext.Contamination

/** The native [[WordNGrams]] expression must agree element-for-element
  * with the composed zip_with-over-slices form it replaces on every
  * input shape — short arrays, empties, nulls inside the array, null
  * arrays — because every gram-derived oracle (dup-ngram share,
  * Jaccard, winnowing, decontamination) was validated against the
  * composed form's semantics.
  */
class NGramsParitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val edge: Seq[Seq[String]] = Seq(
    Seq(),                       // empty
    Seq("a"),                    // shorter than n for n >= 2
    Seq("a", "b"),
    Seq("a", "b", "c", "d"),
    Seq("a", null, "c", "d"),    // null token nulls covering windows
    Seq(null, null),
    Seq("", "", ""),             // empty-string tokens are NOT null
    Seq("x y", "z")              // token containing the join char
  )

  private def randomTokens(rng: Random): Seq[String] =
    Seq.fill(rng.nextInt(8))(
      if (rng.nextInt(10) == 0) null
      else rng.alphanumeric.take(1 + rng.nextInt(5)).mkString)

  test("native graft_ngrams == composed zip_with form, n = 1..5") {
    GraftFunctions.register(spark)
    val rng = new Random(42)
    val rows = edge ++ Seq.fill(200)(randomTokens(rng))
    val df = rows.map(Tuple1(_)).toDF("tk")
    for (n <- 1 to 5) {
      val got = df.select(
          Contamination.ngrams(col("tk"), n).as("native"),
          Contamination.ngramsComposed(col("tk"), n).as("composed"))
        .collect()
      got.zip(rows).foreach { case (r, in) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch on $in: native=${r.getSeq[String](0)} " +
            s"composed=${r.getSeq[String](1)}")
      }
    }
  }

  test("null array maps to empty, matching the composed when-guard") {
    GraftFunctions.register(spark)
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("tk")
    val r = df.select(
        Contamination.ngrams(col("tk"), 3).as("native"),
        Contamination.ngramsComposed(col("tk"), 3).as("composed"))
      .collect()(0)
    assert(r.getSeq[String](0) == Seq() && r.getSeq[String](1) == Seq())
  }

  test("expression participates in codegen (no fallback errors) on volume") {
    GraftFunctions.register(spark)
    val n = spark.range(10000)
      .select(split(concat(lit("a b c d e f "), col("id")), " ").as("tk"))
      .select(explode(Contamination.ngrams(col("tk"), 3)).as("g"))
      .count()
    assert(n == 50000)
  }
}
