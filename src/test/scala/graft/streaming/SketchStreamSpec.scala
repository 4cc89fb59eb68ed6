package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The Misra-Gries retention guarantee under Structured Streaming's
  * stateful aggregation: candidates survive across triggers (the
  * sketch buffer IS the streaming state, merged per micro-batch), and
  * every item above the guarantee threshold appears in its window's
  * candidate set.
  */
class SketchStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("windowed MG sketch retains heavy items across micro-batches") {
    val in = Files.createTempDirectory("sketch-stream").toString
    val h0 = 0L // window [epoch, epoch+1h)
    def us(min: Long): Long = (h0 + min * 60L) * 1000000L
    // batch 1: "hot" 30x + 15 distinct fillers; batch 2 (same window):
    // "hot" 10x + 15 more fillers; a second window with "warm" 5x + 3
    // fillers. m = 4 << 30 distinct fillers, so the sketch MUST
    // cancel — the guarantee still retains hot (40/70 > 1/5) and
    // warm (5/8 > 1/5).
    val b1 = (1 to 30).map(i => ("hot", us(i))) ++
      (1 to 15).map(i => (s"f1_$i", us(i)))
    // null tokens must be dropped (batch heavyHitters contract), not
    // become null sketch keys — pre-fix this NPE'd in finish() mid-stream
    val b2 = (1 to 10).map(i => ("hot", us(30 + i % 20))) ++
      (1 to 15).map(i => (s"f2_$i", us(i))) ++
      (1 to 3).map(i => (null: String, us(i)))
    val w2 = (1 to 5).map(i => ("warm", us(70 + i))) ++
      (1 to 3).map(i => (s"g_$i", us(70 + i)))
    b1.toDF("token", "t_us").coalesce(1).write.parquet(s"$in/b1")
    b2.toDF("token", "t_us").coalesce(1).write.parquet(s"$in/b2")
    w2.toDF("token", "t_us").coalesce(1).write.parquet(s"$in/b3")

    val stream = spark.readStream.schema("token STRING, t_us LONG")
      .option("maxFilesPerTrigger", "1") // force multi-trigger state merge
      .parquet(s"$in/*")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val q = StreamOps.heavyHitterStream(stream, "token", "ts",
      m = 4, windowDur = "1 hour", lateness = "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("hh_stream").start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql("select * from hh_stream").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getSeq[String](1), r.getLong(2)))
    assert(rows.length == 2, s"expected 2 windows, got ${rows.toSeq}")
    val byWindow = rows.map(t => (t._1, (t._2, t._3))).toMap
    val (candW1, n1) = byWindow(0L) // epoch window
    val (candW2, n2) = byWindow(3600L * 1000)
    assert(n1 == 70L && n2 == 8L,
      "null tokens must not count toward window totals")
    assert(candW1.contains("hot"), s"window 1 lost the heavy item: $candW1")
    assert(candW1.size <= 4)
    assert(candW2.contains("warm"), s"window 2 lost the heavy item: $candW2")
    assert(candW2.size <= 4)
  }
}
