package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  private val batch1 = Seq(
    // user 1: two events 5 min apart (one session)
    (1L, us(0), 1L, "click", 1.0),
    (2L, us(5), 1L, "click", 2.0),
    // user 2: one event
    (3L, us(0), 2L, "view", 3.0))
  private val batch2 = Seq(
    // user 1: 40-min gap since ts=5min → session 2 opens
    (4L, us(45), 1L, "click", 4.0),
    // user 2: within gap → same session
    (5L, us(20), 2L, "view", 5.0))

  private def writeBatch(dir: String, rows: Seq[(Long, Long, Long, String, Double)], name: String): Unit =
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/$name")

  test("stateful sessionization carries state across micro-batches") {
    val in = Files.createTempDirectory("stream-in").toString
    writeBatch(in, batch1, "b1")
    val events = StreamOps.readEventStream(spark, s"$in/*")
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[StreamOps.Evt]
    val q = StreamOps.sessionize(events).writeStream
      .outputMode("append").format("memory").queryName("sessions")
      .start()
    q.processAllAvailable()
    writeBatch(in, batch2, "b2")
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql("select * from sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(5)))

    // user 1 session 1 was open after batch1 (2 events), closed by batch2
    assert(rows.contains((1L, 1L, 2L, false)))
    assert(rows.contains((1L, 1L, 2L, true)))
    // user 1 session 2 open with 1 event
    assert(rows.contains((1L, 2L, 1L, false)))
    // user 2: one session, extended to 2 events, never closed
    assert(rows.contains((2L, 1L, 2L, false)))
    assert(!rows.exists(r => r._1 == 2L && r._4))
  }

  test("streaming dedup keeps one row per uid within the watermark horizon") {
    val in = Files.createTempDirectory("stream-dedup").toString
    Seq(("u1", us(0)), ("u2", us(1)), ("u1", us(2)), ("u3", us(3)), ("u2", us(4)))
      .toDF("uid", "ts_us").coalesce(1).write.parquet(s"$in/b1")
    val links = spark.readStream
      .schema("uid STRING, ts_us LONG").parquet(s"$in/*")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.dedupStream(links, "ts").writeStream
      .outputMode("append").format("memory").queryName("dedup").start()
    q.processAllAvailable()
    q.stop()
    val uids = spark.sql("select uid from dedup").collect().map(_.getString(0))
    assert(uids.sorted.toSeq == Seq("u1", "u2", "u3"))
  }

  test("watermarked hourly aggregation matches the batch grouping") {
    val in = Files.createTempDirectory("stream-agg").toString
    writeBatch(in, batch1 ++ batch2, "all")
    val q = StreamOps.hourlyAgg(StreamOps.readEventStream(spark, s"$in/*"))
      .writeStream.outputMode("complete").format("memory").queryName("hourly")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("select event_type, n, sum_value from hourly")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("click", 3L, 7.0), ("view", 2L, 8.0)))
  }
}
