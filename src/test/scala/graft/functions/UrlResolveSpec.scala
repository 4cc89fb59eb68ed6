package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.UrlOps

/** The native codegen expression must agree with the UDF (and the pure
  * function) on every input shape, including nulls.
  */
class UrlResolveSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val cases = Seq(
    ("https://ex.test/a/b/", "img/c.jpg"),
    ("https://ex.test/a/b/page.html", "img/c.jpg"),
    ("https://ex.test/a/b/", "/abs/c.png"),
    ("https://ex.test/a/b/", "//cdn.test/c.png"),
    ("https://ex.test/a/b/", "http://abs.test/x.gif"),
    ("ht tp://broken base", "img/c.jpg"),
    (null, "img/c.jpg"),
    ("https://ex.test/", null))

  test("native url_resolve == UDF == pure function (incl. null semantics)") {
    GraftFunctions.register(spark)
    val df = cases.toDF("base", "rel")
      .withColumn("native", call_function("url_resolve", col("base"), col("rel")))
      .withColumn("viaUdf", UrlOps.makeLinkAbsolute(col("base"), col("rel")))
    df.collect().foreach { r =>
      val base = if (r.isNullAt(0)) null else r.getString(0)
      val rel = if (r.isNullAt(1)) null else r.getString(1)
      val native = if (r.isNullAt(2)) null else r.getString(2)
      val expected = if (rel == null) null
        else if (base == null) rel
        else UrlOps.resolveUrl(base, rel)
      assert(native == expected, s"native mismatch for ($base, $rel)")
    }
  }

  test("expression participates in codegen (no fallback errors) on volume") {
    GraftFunctions.register(spark)
    val n = spark.range(10000)
      .select(concat(lit("https://s"), col("id"), lit(".test/a/")).as("base"),
        concat(lit("p"), col("id"), lit(".jpg")).as("rel"))
      .select(call_function("url_resolve", col("base"), col("rel")).as("u"))
      .where(col("u").endsWith(".jpg")).count()
    assert(n == 10000)
  }
}
