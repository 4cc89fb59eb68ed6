package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class JsonlSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("write/read roundtrip preserves rows; shards are gzip; count = parallelism") {
    val dir = Files.createTempDirectory("jsonl").toString
    val docs = (1L to 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    Jsonl.write(docs, dir, shards = 5)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length == 5, "shard count is the contract")
    // Spark disallows queries referencing ONLY the corrupt column —
    // collect full rows and assert driver-side
    val rows = Jsonl.read(spark, dir, schema).collect()
    assert(rows.forall(_.isNullAt(2)), "no corrupt records expected")
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet ==
      (1L to 100L).map(i => (i, s"text $i")).toSet)
  }

  test("a caller schema claiming the corrupt column is rejected loudly") {
    val clash = schema.add(Jsonl.CorruptCol, StringType)
    val e = intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/unused", clash)
    }
    assert(e.getMessage.contains(Jsonl.CorruptCol),
      "the message must name the reserved column")
  }

  test("a corrupt line quarantines instead of failing the shard") {
    val dir = Files.createTempDirectory("jsonl_bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-bad.json"),
      """{"doc_id": 1, "text": "ok"}
        |this is not json
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val rows = Jsonl.read(spark, dir, schema).collect()
    assert(rows.length == 3)
    val (bad, good) = rows.partition(r => !r.isNullAt(2))
    assert(bad.length == 1 && bad.head.isNullAt(0))
    assert(good.map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
