package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // event times sit 20 h past the epoch: rows at/behind the watermark are
  // dropped by watermarked stateful ops, and the initial watermark is 0,
  // so a ts = 0 event would silently vanish
  private def us(minutes: Long): Long = (minutes + 1200L) * 60L * 1000000L

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

  test("idle sessions close via event-time timeout and state is cleared") {
    val in = Files.createTempDirectory("stream-timeout").toString
    writeBatch(in, batch1, "b1")
    val events = StreamOps.readEventStream(spark, s"$in/*")
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[StreamOps.Evt]
    val q = StreamOps.sessionize(events).writeStream
      .outputMode("append").format("memory").queryName("sessions_to")
      .start()
    q.processAllAvailable()
    // a far-future event from another user advances the watermark...
    writeBatch(in, Seq((6L, us(120), 99L, "click", 1.0)), "b2")
    q.processAllAvailable()
    // ...and the next batch runs with that watermark (90 min after
    // lateness), firing the inactivity timeouts for users 1 and 2
    writeBatch(in, Seq((7L, us(125), 99L, "click", 1.0)), "b3")
    q.processAllAvailable()
    // a returning timed-out user restarts at session_idx 1 — the state
    // entry really was removed, not kept around
    writeBatch(in, Seq((8L, us(126), 1L, "click", 1.0)), "b4")
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql("select * from sessions_to").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(5)))

    // idle users 1 and 2 were closed by timeout with their final counts
    assert(rows.contains((1L, 1L, 2L, true)))
    assert(rows.contains((2L, 1L, 1L, true)))
    // user 99 stayed active — never closed
    assert(!rows.exists(r => r._1 == 99L && r._4))
    // user 1's post-timeout event opened a fresh session_idx = 1
    assert(rows.contains((1L, 1L, 1L, false)))
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

  test("stream-static enrichment attaches dimension columns per batch") {
    val in = Files.createTempDirectory("stream-enrich").toString
    writeBatch(in, batch1, "b1")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamOps.enrichStream(
      StreamOps.readEventStream(spark, s"$in/*"), dim, "user_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("select user_id, tier from enriched").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "gold"), (2L, "basic")))
    assert(spark.sql("select * from enriched").count() == batch1.size)
  }

  test("streaming fuzzy dedup collapses reordered near-identical docs") {
    val in = Files.createTempDirectory("stream-fuzzy").toString
    Seq(
      (1L, "the cat sat on the mat", us(0)),
      (2L, "on the mat the cat sat", us(1)), // same token set as doc 1
      (3L, "completely different words here", us(2)))
      .toDF("doc_id", "text", "ts_us").coalesce(1).write.parquet(s"$in/b1")
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING, ts_us LONG").parquet(s"$in/*")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.fuzzyDedupStream(docs, "text", "ts").writeStream
      .outputMode("append").format("memory").queryName("fuzzy").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("select doc_id from fuzzy").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L)) // doc 2's signature matches doc 1's
  }

  test("streaming contamination alerts flag benchmark-overlap docs once") {
    val in = Files.createTempDirectory("stream-contam").toString
    val bench = Seq((100L, "q w e r t y u i")).toDF("doc_id", "text")
    Seq(
      (1L, "x q w e r t y z", us(0)),       // shares 5-grams with benchmark
      (2L, "m n o p s t u v", us(1)),       // clean
      (3L, "z q w e r t y x", us(2)))       // also contaminated
      .toDF("doc_id", "text", "ts_us").coalesce(1).write.parquet(s"$in/b1")
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING, ts_us LONG").parquet(s"$in/*")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val q = StreamOps.contaminationAlerts(docs, bench, "doc_id", "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("contam").start()
    q.processAllAvailable()
    q.stop()
    val flagged = spark.sql("select doc_id from contam").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(flagged == Seq(1L, 3L)) // one alert per doc, clean doc absent
  }

  test("stream-stream interval join attributes clicks to impressions within the window") {
    val dirL = Files.createTempDirectory("imp-in").toString
    val dirR = Files.createTempDirectory("clk-in").toString
    // impressions: ad 1 at t=0, ad 2 at t=0
    Seq((1L, us(0)), (2L, us(0)))
      .toDF("ad_id", "imp_us").coalesce(1).write.parquet(s"$dirL/b1")
    // clicks: ad 1 at t=5 (inside 10-min window), ad 2 at t=30 (outside),
    // ad 3 at t=5 (no impression)
    Seq((1L, us(5)), (2L, us(30)), (3L, us(5)))
      .toDF("click_ad", "clk_us").coalesce(1).write.parquet(s"$dirR/b1")

    val imps = spark.readStream
      .schema("ad_id LONG, imp_us LONG").parquet(s"$dirL/*")
      .withColumn("imp_ts", timestamp_micros(col("imp_us")))
    val clicks = spark.readStream
      .schema("click_ad LONG, clk_us LONG").parquet(s"$dirR/*")
      .withColumn("clk_ts", timestamp_micros(col("clk_us")))

    val q = StreamOps.intervalJoinStreams(imps, clicks,
      "ad_id", "click_ad", "imp_ts", "clk_ts", window = "10 minutes")
      .select("ad_id", "imp_us", "clk_us")
      .writeStream.outputMode("append").format("memory")
      .queryName("attributed").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("select ad_id, clk_us from attributed").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, us(5))))
  }

  test("capPerKeyStream admits at most k per key across micro-batches") {
    val in = Files.createTempDirectory("cap-in").toString
    // batch 1: domain a sends 2 (both admitted), domain b sends 1
    Seq(("a.test", us(0), 1L), ("a.test", us(1), 2L), ("b.test", us(0), 10L))
      .toDF("key", "ts_us", "id").coalesce(1).write.parquet(s"$in/b1")
    val q = StreamOps.capPerKeyStream(
      spark.readStream.schema("key STRING, ts_us LONG, id LONG")
        .parquet(s"$in/*").as[StreamOps.Keyed], k = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("capped").start()
    q.processAllAvailable()
    // batch 2: domain a sends 3 more — only ONE seat left under k=3,
    // taken by the earliest (ts, id)
    Seq(("a.test", us(2), 3L), ("a.test", us(3), 4L), ("a.test", us(4), 5L))
      .toDF("key", "ts_us", "id").coalesce(1).write.parquet(s"$in/b2")
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("select key, id, admit_rank from capped").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a.test", 1L, 1L), ("a.test", 2L, 2L), ("b.test", 10L, 1L),
      ("a.test", 3L, 3L)))
  }

  test("capPerKeyStream state survives a checkpointed query restart") {
    val in = Files.createTempDirectory("cap-ckpt-in").toString
    val ckpt = Files.createTempDirectory("cap-ckpt").toString
    def capped() = StreamOps.capPerKeyStream(
      spark.readStream.schema("key STRING, ts_us LONG, id LONG")
        .parquet(s"$in/*").as[StreamOps.Keyed], k = 2)
    val out = Files.createTempDirectory("cap-ckpt-out").toString
    // memory sink can't recover from a checkpoint — use the file sink
    def run(): Unit = {
      val q = capped().writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      q.stop()
    }
    // run 1: admit both seats for domain a, then STOP the query
    Seq(("a.test", us(0), 1L), ("a.test", us(1), 2L))
      .toDF("key", "ts_us", "id").coalesce(1).write.parquet(s"$in/b1")
    run()
    assert(spark.read.parquet(out).count() === 2L)
    // run 2: SAME checkpoint — the recovered counter must refuse the
    // next arrival (a fresh query would wrongly re-admit up to k)
    Seq(("a.test", us(2), 3L), ("b.test", us(2), 9L))
      .toDF("key", "ts_us", "id").coalesce(1).write.parquet(s"$in/b2")
    run()
    val got = spark.read.parquet(out)
      .select("key", "id", "admit_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // only the new-domain row lands; a.test's quota was spent in run 1
    assert(got == Set(("a.test", 1L, 1L), ("a.test", 2L, 2L),
      ("b.test", 9L, 1L)))
  }

  test("interval join resolves key/ts columns per side even when names collide") {
    // both streams name their key `k` and timestamp `ts`: a bare
    // col("k") === col("k") would be ambiguous (or self-referencing);
    // the join must resolve each column against its own side
    val dirL = Files.createTempDirectory("ij-l").toString
    val dirR = Files.createTempDirectory("ij-r").toString
    Seq((1L, us(0))).toDF("k", "t_us").coalesce(1).write.parquet(s"$dirL/b1")
    Seq((1L, us(5)), (1L, us(30))).toDF("k", "t_us")
      .coalesce(1).write.parquet(s"$dirR/b1")
    def rd(dir: String) = spark.readStream
      .schema("k LONG, t_us LONG").parquet(s"$dir/*")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val joined = StreamOps.intervalJoinStreams(rd(dirL), rd(dirR),
      "k", "k", "ts", "ts", window = "10 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ij_collide").start()
    q.processAllAvailable()
    q.stop()
    // only the t=5 right row lands inside the 10-minute interval
    assert(spark.sql("select * from ij_collide").count() === 1L)
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
