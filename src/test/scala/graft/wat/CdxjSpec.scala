package graft.wat

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ext.Surt

/** CDXJ line grammar + SURT canonicalization + the text-index →
  * ranged-fetch equivalence with the parquet index.
  */
class CdxjSpec extends AnyFunSuite with SparkTestBase {

  test("SURT: every rule, one vector each") {
    assert(Surt.surtKey("https://www.Example.COM/Path?b=2&a=1") ==
      "com,example)/path?a=1&b=2")
    assert(Surt.surtKey("http://sub.site.org/") == "org,site,sub)/")
    assert(Surt.surtKey("https://example.com") == "com,example)/")
    assert(Surt.surtKey("http://example.com:8080/x") ==
      "com,example:8080)/x")
    assert(Surt.surtKey("https://example.com:443/x") == "com,example)/x")
    assert(Surt.surtKey("http://example.com:80/x") == "com,example)/x")
    assert(Surt.surtKey("http://user:pw@example.com/x") ==
      "com,example)/x")
    assert(Surt.surtKey("https://example.com/x#frag") == "com,example)/x")
    // www strip needs >2 labels (www.example.com -> example; but a
    // bare www.com must keep its host)
    assert(Surt.surtKey("http://www2.example.com/") == "com,example)/")
    assert(Surt.surtKey("http://www.com/") == "com,www)/")
    // an @ in the QUERY is not userinfo
    assert(Surt.surtKey("http://example.com/x?user=a@b") ==
      "com,example)/x?user=a@b")
    // schemeless input still keys
    assert(Surt.surtKey("example.com/x") == "com,example)/x")
  }

  test("parseLine: round-trip, field tolerance, malformed lines drop") {
    val line = Cdxj.formatLine("https://www.example.com/a?x=1",
      "20240101120000", "text/html", 200, "QQ44", "seg/x.warc.gz",
      12345L, 678L)
    assert(line.startsWith("com,example)/a?x=1 20240101120000 {"))
    val r = Cdxj.parseLine(line).get
    assert(r.surtKey == "com,example)/a?x=1" &&
      r.timestamp == "20240101120000" &&
      r.url == "https://www.example.com/a?x=1" &&
      r.mime == "text/html" && r.status == 200 && r.digest == "QQ44" &&
      r.filename == "seg/x.warc.gz" && r.offset == 12345L &&
      r.length == 678L)
    // quotes in the url escape and round-trip
    val esc = Cdxj.formatLine("https://e.test/\"q\"", "20240101000000",
      "", 0, "", "f", 0L, 1L)
    assert(Cdxj.parseLine(esc).exists(_.url == "https://e.test/\"q\""))
    // malformed lines: wrong timestamp width, broken json, missing
    // url, non-numeric offset — all None, never a throw
    assert(Cdxj.parseLine("").isEmpty)
    assert(Cdxj.parseLine("key only").isEmpty)
    assert(Cdxj.parseLine("k 2024 {\"url\": \"x\"}").isEmpty)
    assert(Cdxj.parseLine("k 20240101000000 {broken").isEmpty)
    assert(Cdxj.parseLine("k 20240101000000 {\"mime\": \"x\"}").isEmpty)
    assert(Cdxj.parseLine(
      "k 20240101000000 {\"url\": \"u\", \"offset\": \"x\", \"length\": \"1\"}")
      .isEmpty)
    // all-ASCII-digit but Long-overflowing offset (20+ digits): must
    // DROP, not throw NumberFormatException and kill the shard task
    assert(Cdxj.parseLine(
      "k 20240101000000 {\"url\": \"u\", " +
        "\"offset\": \"99999999999999999999\", \"length\": \"1\"}")
      .isEmpty)
    // Int-overflowing status: same fail-soft contract
    assert(Cdxj.parseLine(
      "k 20240101000000 {\"url\": \"u\", \"offset\": \"1\", " +
        "\"length\": \"1\", \"status\": \"99999999999\"}")
      .isEmpty)
    // non-ASCII Unicode digits (Arabic-Indic ٣): Char.isDigit admits
    // them but toLong throws — validation is ASCII-only now
    assert(Cdxj.parseLine(
      "k 20240101000000 {\"url\": \"u\", \"offset\": \"٣\", " +
        "\"length\": \"1\"}").isEmpty)
    assert(Cdxj.parseLine(
      "k 2024010100000٣ {\"url\": \"u\", \"offset\": \"1\", " +
        "\"length\": \"1\"}").isEmpty)
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 100)
      Cdxj.parseLine(new String(
        Array.fill(rnd.nextInt(80))((32 + rnd.nextInt(90)).toChar)))
  }

  test("indexFrame over the cdxj shards equals the parquet index") {
    val (cdxjs, _) = WatFixture.ensureDocCdxj(spark, "/root/testdata/sf0.001")
    val (idxPath, _) =
      WatFixture.ensureDocCcIndex(spark, "/root/testdata/sf0.001")
    val fromText = Cdxj.indexFrame(spark, cdxjs)
      .select("url", "content_mime_type", "fetch_status",
        "content_digest", "warc_filename", "warc_record_offset",
        "warc_record_length")
      .collect().map(_.toSeq).sortBy(_.toString)
    val fromParquet = spark.read.parquet(idxPath)
      .select("url", "content_mime_type", "fetch_status",
        "content_digest", "warc_filename", "warc_record_offset",
        "warc_record_length")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(fromText.length == fromParquet.length &&
      fromText.sameElements(fromParquet))
    // shard lines are SURT-sorted (the seekability contract)
    val keys = Cdxj.indexFrame(spark, cdxjs.take(1))
      .select("url_surtkey").collect().map(_.getString(0))
    assert(keys.nonEmpty && keys.sameElements(keys.sorted))
  }
}
