package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.UrlOps

/** SURVEY §7.3 hazard audit: `java.net.URI.resolve` vs CPython
  * `urllib.parse.urljoin` on adversarial input.
  *
  * Two layers:
  *  1. the committed vector corpus (`tools/urljoin_vectors.tsv`) FREEZES
  *     our chosen behavior — every row's `ours` column must equal what
  *     the engine computes today (pure function, interpreted Catalyst
  *     eval, codegen'd expression, and the UDF fallback all agree), and
  *     the MATCH/DIVERGE status against CPython is re-derived, so a
  *     silent behavior change OR an undocumented new divergence fails;
  *  2. ScalaCheck fuzz over scheme-relative / dot-segment / empty /
  *     garbage compositions — totality (never throws), absolute-http
  *     identity, and engine-path agreement on arbitrary input.
  */
class UrlJoinParitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private case class Vec(base: String, rel: String, ours: String,
      python: String, status: String, note: String)

  private def loadVectors(): Seq[Vec] = {
    // repo-root anchored, not cwd-relative — same hazard TailParquetPath
    // guards against (an IDE/sandbox runner with a different cwd would
    // otherwise miss the committed corpus)
    val path = new java.io.File(
      new java.io.File(graft.wat.WatFixture.repoRoot, "tools"),
      "urljoin_vectors.tsv")
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val f = l.split("\t", -1)
        require(f.length >= 5, s"bad vector line: $l")
        Vec(f(0), f(1), f(2), f(3), f(4), if (f.length > 5) f(5) else "")
      }.toList
    finally src.close()
  }

  private def checkProp(prop: Prop, min: Int = 500): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  test("committed vector corpus freezes resolveUrl behavior and its CPython divergences") {
    val vecs = loadVectors()
    assert(vecs.size >= 25)
    vecs.foreach { v =>
      val got = UrlOps.resolveUrl(v.base, v.rel)
      assert(got == v.ours,
        s"behavior drifted for (${v.base}, ${v.rel}): got $got, frozen ${v.ours}")
      val derived = if (v.ours == v.python) "MATCH" else "DIVERGE"
      assert(derived == v.status,
        s"divergence status drifted for (${v.base}, ${v.rel}): " +
          s"derived $derived, recorded ${v.status} (${v.note})")
    }
    // the divergence budget is closed: exactly the documented rows differ
    assert(vecs.count(_.status == "DIVERGE") == 9)
  }

  test("all four engine paths agree on every vector row") {
    GraftFunctions.register(spark)
    val vecs = loadVectors()
    // interpreted Catalyst eval
    vecs.foreach { v =>
      val interp = UrlResolve(Literal(v.base), Literal(v.rel)).eval(null)
      assert(Option(interp).map(_.toString).orNull == v.ours,
        s"interpreted eval drifted for (${v.base}, ${v.rel})")
    }
    // codegen'd expression + UDF fallback, through a real plan
    val rows = vecs.map(v => (v.base, v.rel, v.ours))
      .toDF("base", "rel", "ours")
      .withColumn("native",
        call_function("url_resolve", col("base"), col("rel")))
      .withColumn("viaUdf", UrlOps.makeLinkAbsolute(col("base"), col("rel")))
      .collect()
    rows.foreach { r =>
      val ours = r.getAs[String]("ours")
      assert(r.getAs[String]("native") == ours,
        s"codegen drifted for (${r.getString(0)}, ${r.getString(1)})")
      assert(r.getAs[String]("viaUdf") == ours,
        s"udf path drifted for (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  // --- fuzz layer ---

  private val fragment: Gen[String] = Gen.oneOf(
    "a", "b1", "..", ".", "", " ", "%7E", "%zz", "é", "\\", "?", "#", ";p=1",
    "xn--", "::", "@u", ":8080", "[::1]", "x y")
  private val sep: Gen[String] = Gen.oneOf("/", "", "//", "./", "../")
  private val scheme: Gen[String] = Gen.oneOf(
    "http://", "https://", "HTTP://", "ftp://", "", "ht tp://", "//", ":",
    "data:", "mailto:")

  private val urlish: Gen[String] = for {
    s <- scheme
    n <- Gen.choose(0, 5)
    parts <- Gen.listOfN(n, Gen.zip(sep, fragment))
  } yield s + parts.map { case (a, b) => a + b }.mkString

  test("fuzz: resolveUrl is total and preserves absolute-http rels") {
    checkProp(Prop.forAll(urlish, urlish) { (base: String, rel: String) =>
      val out = UrlOps.resolveUrl(base, rel) // must not throw
      val absolute = rel.startsWith("http://") || rel.startsWith("https://")
      (out != null) && (!absolute || out == rel)
    })
  }

  test("fuzz: interpreted Catalyst eval agrees with the pure function") {
    checkProp(Prop.forAll(urlish, urlish) { (base: String, rel: String) =>
      val expect = UrlOps.resolveUrl(base, rel)
      val interp = UrlResolve(Literal(base), Literal(rel)).eval(null)
      Option(interp).map(_.toString).orNull == expect
    })
  }

  test("fuzz: codegen path agrees with the pure function on a seeded batch") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val params = Gen.Parameters.default
    def sample(): String =
      urlish(params, org.scalacheck.rng.Seed(rnd.nextLong())).getOrElse("")
    val cases = Seq.fill(2000)((sample(), sample()))
    val got = cases.toDF("base", "rel")
      .withColumn("native",
        call_function("url_resolve", col("base"), col("rel")))
      .collect()
    got.foreach { r =>
      val base = r.getString(0); val rel = r.getString(1)
      assert(r.getAs[String]("native") == UrlOps.resolveUrl(base, rel),
        s"codegen fuzz mismatch for ($base, $rel)")
    }
  }
}
