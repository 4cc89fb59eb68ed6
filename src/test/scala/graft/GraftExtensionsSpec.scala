package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions=graft.GraftExtensions must make url_resolve
  * available in SQL without explicit registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions injector registers url_resolve for SQL") {
    SparkSession.getActiveSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT url_resolve('https://ex.test/a/b/', 'img/c.jpg') AS u")
        .collect()(0).getString(0)
      assert(got == "https://ex.test/a/b/img/c.jpg")
      // base-fallback variant: malformed head-base keeps the page url
      val base = spark.sql(
        "SELECT url_resolve_base('https://ex.test/a/', 'ht tp://bro ken') AS u")
        .collect()(0).getString(0)
      assert(base == "https://ex.test/a/")
      // native hash injected too, equal to the composed md5 form
      val h = spark.sql(
        """SELECT graft_h32('abc') AS n,
          |  cast(conv(substring(md5('abc'), 1, 8), 16, 10) AS bigint) AS c
          |""".stripMargin).collect()(0)
      assert(h.getLong(0) == h.getLong(1))
    } finally spark.stop()
  }
}
