package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the batch operators: tumbling-window
  * aggregation (the streaming q_hourly_agg) and stateful gap
  * sessionization (the streaming q_sessionize). The reference is
  * batch-only (SURVEY.md §2.12); these are north-star extensions.
  *
  * Scale notes: the windowed agg is a standard watermarked partial/final
  * agg — state is bounded by (watermark horizon × key cardinality).
  * Sessionization keys state by user_id; state size is O(active users),
  * and closed sessions are emitted incrementally (append mode).
  */
object StreamOps {

  final case class Evt(user_id: Long, ts_us: Long, event_id: Long)

  final case class Keyed(key: String, ts_us: Long, id: Long)
  final case class CapState(admitted: Long)
  final case class Admitted(key: String, ts_us: Long, id: Long,
      admit_rank: Long)

  final case class SessionState(
      sessionIdx: Long, startUs: Long, lastUs: Long, nEvents: Long)

  final case class SessionOut(
      user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long, closed: Boolean)

  /** Schema for streaming reads of the events fixture (ts as µs long —
    * nanos-normalized upstream).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** Watermarked tumbling-window aggregate — identical grouping to the
    * batch q_hourly_agg, and the same EXACT integer-cents money sum
    * (a raw double sum would make stream and batch results — and the
    * DuckDB oracle — disagree in the last bits depending on reduction
    * order; q_curation_stream-style cross-engine hashing needs exact).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Per-window heavy hitters via the mergeable Misra-Gries sketch
    * ([[graft.ext.Sketches.MisraGries]] as a streaming UDAF): each
    * tumbling window emits its candidate set (every item above
    * n/(m+1) of the window's traffic is guaranteed present) plus the
    * window's stream length so a consumer can recount-and-threshold
    * exactly, batch-style. State per window is the ≤ m-entry sketch
    * buffer — bounded regardless of token cardinality, which is the
    * whole point at intake scale (a windowed groupBy(token) would
    * hold state per distinct token per window horizon).
    */
  def heavyHitterStream(rows: DataFrame, tokenCol: String,
      eventTimeCol: String, m: Int, windowDur: String,
      lateness: String): DataFrame = {
    val mg = udaf(new graft.ext.Sketches.MisraGries(m),
      org.apache.spark.sql.Encoders.STRING)
    rows
      // batch Sketches.heavyHitters filters nulls before sketching; a
      // null token here would become a null counter key and finish()'s
      // sorted key dump would NPE mid-stream — same contract both paths
      .where(col(tokenCol).isNotNull)
      .withWatermark(eventTimeCol, lateness)
      .groupBy(window(col(eventTimeCol), windowDur).as("w"))
      .agg(mg(col(tokenCol)).as("candidates"),
        count(lit(1)).as("n_total"))
      .select(col("w.start").as("window_start"), col("candidates"),
        col("n_total"))
  }

  /** Streaming exact dedup — the pipeline's A1 in streaming form.
    * `dropDuplicatesWithinWatermark` is required for bounded state: plain
    * `dropDuplicates("uid")` would never evict (the event-time column is
    * not part of the key), growing one state entry per distinct uid
    * forever — not survivable at 100 TB/day.
    */
  def dedupStream(links: DataFrame, eventTimeCol: String,
      horizon: String = "1 hour"): DataFrame =
    links.withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("uid")

  /** Stream-static enrichment: each micro-batch equi-joins the
    * (slowly-changing) static dimension — Spark re-plans per batch and
    * broadcasts the dimension while it is small. The standard pattern
    * for attaching user/document metadata to an event stream; inner
    * equi-joins against static sides need no state and no watermark.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(dim, Seq(key))

  /** Streaming curation gate: the C4-style front half of the batch
    * q_c4_pipeline as a STATELESS streaming transform — per-row HTML
    * boilerplate strip ([[graft.ext.Boilerplate.stripColumn]], the
    * zero-shuffle array-HOF form) followed by the blocklist gate, both
    * pure column expressions: no state, no watermark, append mode. A
    * doc whose page strips to nothing or carries any blocklisted term
    * never enters the corpus; survivors flow on with their recovered
    * `clean_text` for the stateful tail (fuzzy dedup, windowed stats).
    */
  def curationGateStream(docs: DataFrame, htmlCol: String,
      terms: Seq[String]): DataFrame =
    docs
      .withColumn("clean_text",
        graft.ext.Boilerplate.stripColumn(col(htmlCol)))
      .where(length(col("clean_text")) > 0 &&
        size(graft.ext.Toxicity.matches(col("clean_text"), terms)) === 0)
      .drop(htmlCol)

  /** Streaming FUZZY dedup: one survivor per MinHash signature within
    * the watermark horizon. The per-row signature (8-member
    * universal-hash family over the distinct-token set, same family as
    * the batch path) is computed with HOFs — no shuffle, no state — and
    * `dropDuplicatesWithinWatermark` keys bounded state on it: documents
    * whose token sets agree on all 8 minima (near-identical content,
    * reorderings included) collapse to the first arrival. State is
    * O(distinct signatures per horizon), evicted by the watermark.
    */
  def fuzzyDedupStream(docs: DataFrame, textCol: String,
      eventTimeCol: String, horizon: String = "1 hour"): DataFrame = {
    val hs = transform(
      array_distinct(split(col(textCol), " ")),
      w => graft.functions.Hashing.h32(w))
    val sig = concat_ws("_",
      graft.ext.NearDup.minhashSignature(hs, numHashes = 8): _*)
    docs
      .withColumn("minhash_sig", sig)
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("minhash_sig")
  }

  /** Streaming benchmark decontamination ALERTS: documents in the stream
    * that share any hashed n-gram with a STATIC benchmark set, emitted
    * once per doc within the watermark horizon — the quarantine feed a
    * training-data intake pipeline tails. Shape: per-row gram explode →
    * stream-static equi-join against the (small, re-broadcast per
    * micro-batch) benchmark gram set — stateless — then
    * `dropDuplicatesWithinWatermark` collapses a doc's multiple gram
    * hits; state is O(flagged docs per horizon), not O(stream).
    */
  def contaminationAlerts(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, eventTimeCol: String, n: Int = 5,
      horizon: String = "1 hour"): DataFrame = {
    val bench = graft.ext.Contamination.benchmarkGrams(
      benchmark, idCol, split(col(textCol), " "), n)
    docs
      .select(col(idCol), col(eventTimeCol), split(col(textCol), " ").as("_tk"))
      .select(col(idCol), col(eventTimeCol),
        explode(graft.ext.Contamination.ngrams(col("_tk"), n)).as("gstr"))
      .select(col(idCol), col(eventTimeCol),
        graft.functions.Hashing.h32(col("gstr")).as("g"))
      .join(broadcast(bench), "g")
      .select(col(idCol), col(eventTimeCol))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(idCol)
  }

  /** Stream-stream interval join — the attribution shape (click within
    * `window` after its impression). Both sides are watermarked and the
    * join condition carries an explicit event-time interval, which is
    * what lets the engine EVICT state: an unbounded-time stream-stream
    * join would buffer both streams forever. State per side is
    * O(events within watermark + interval horizon).
    *
    * `left`/`right` must already carry event-time columns `leftTs` /
    * `rightTs`; the join matches `leftKey = rightKey AND rightTs in
    * [leftTs, leftTs + window]`.
    */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      window: String = "10 minutes",
      lateness: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    // resolve each column against its own side: bare col(...) would be
    // ambiguous (or silently self-referencing) whenever the two streams
    // share a key or timestamp column name
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $window"))
  }

  /** Streaming per-key admission cap — [[graft.ext.UrlAnalysis]]'s
    * per-domain cap in streaming form: admit at most `k` rows per key,
    * then drop, with the counter expiring `horizonUs` past the
    * watermark — the intake rate limiter that stops one hot domain
    * from flooding a continuous crawl pipeline. Admission is
    * arrival-ordered across micro-batches (deterministic (ts_us, id)
    * order within a batch); `admit_rank` is the 1-based running rank.
    *
    * State is ONE counter per key seen within the horizon, removed by
    * event-time timeout — O(active keys), never O(stream). Unlike the
    * batch form (global salted-hash pick over all candidates), a
    * stream cannot rank rows it has not seen yet, so first-arrival IS
    * the correct online semantics.
    */
  def capPerKeyStream(rows: Dataset[Keyed], k: Int,
      horizonUs: Long = 3600L * 1000000L,
      lateness: String = "30 minutes"): Dataset[Admitted] = {
    require(k > 0, "admission cap must be positive")
    val spark = rows.sparkSession
    import spark.implicits._

    def update(key: String, it: Iterator[Keyed],
        state: GroupState[CapState]): Iterator[Admitted] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val prev = state.getOption.map(_.admitted).getOrElse(0L)
      val room = math.max(0L, k - prev).toInt
      // expire one horizon past the latest activity, in EVENT time
      // (the initial watermark is 0 — anchoring to it would let the
      // first real watermark advance blow away live counters), and
      // always beyond the current watermark or the runtime rejects it
      def refreshTimeout(maxTsUs: Long): Unit =
        state.setTimeoutTimestamp(math.max(
          maxTsUs / 1000L + horizonUs / 1000L,
          state.getCurrentWatermarkMs() + 1L))
      if (room == 0) {
        // cap exhausted — this is exactly the flooded hot key the
        // operator exists to throttle, so don't materialize or sort its
        // batch slice: stream the iterator for the max ts_us the timeout
        // refresh needs and admit nothing. O(1) memory, O(n) CPU.
        var maxTs = Long.MinValue
        it.foreach(r => if (r.ts_us > maxTs) maxTs = r.ts_us)
        if (maxTs != Long.MinValue) refreshTimeout(maxTs)
        return Iterator.empty
      }
      // micro-batch rows are unordered — admit in (ts_us, id) order
      val rowsSeq = it.toSeq.sortBy(r => (r.ts_us, r.id))
      val admitted = rowsSeq.take(room)
      if (admitted.nonEmpty) state.update(CapState(prev + admitted.size))
      if (state.exists)
        refreshTimeout(rowsSeq.iterator.map(_.ts_us).max)
      admitted.iterator.zipWithIndex.map { case (r, i) =>
        Admitted(r.key, r.ts_us, r.id, prev + i + 1) }
    }

    rows.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", lateness)
      .as[Keyed]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stateful sessionization: 30-min inactivity gap, state = the open
    * session per user. Emits a session row whenever it is extended or
    * closed; `closed = true` rows are final (append-style consumers keep
    * those).
    *
    * State is BOUNDED: each update schedules an `EventTimeTimeout` at
    * (last activity + gap), so a user who stops sending events gets a
    * final `closed = true` row and their state entry removed once the
    * watermark passes the gap — state is O(users active within one gap
    * horizon), not O(all users ever seen). A later event from a
    * timed-out user starts over at session_idx 1 (its prior closed rows
    * are already final). `lateness` is the watermark delay — how far
    * out-of-order event times may arrive before being dropped.
    */
  def sessionize(events: Dataset[Evt], gapUs: Long = 1800L * 1000000L,
      lateness: String = "30 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, it: Iterator[Evt],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // inactivity expiry: finalize the open session, clear the entry
        val cur = state.get
        state.remove()
        return Iterator.single(SessionOut(userId, cur.sessionIdx,
          cur.nEvents, cur.startUs, cur.lastUs, closed = true))
      }
      // events within a micro-batch are unordered — sort per group
      val evts = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      if (evts.isEmpty) return Iterator.empty
      var cur = state.getOption.orNull
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      evts.foreach { e =>
        if (cur == null) {
          cur = SessionState(1L, e.ts_us, e.ts_us, 1L)
        } else if (e.ts_us - cur.lastUs > gapUs) {
          out += SessionOut(userId, cur.sessionIdx, cur.nEvents,
            cur.startUs, cur.lastUs, closed = true)
          cur = SessionState(cur.sessionIdx + 1, e.ts_us, e.ts_us, 1L)
        } else {
          cur = cur.copy(lastUs = e.ts_us, nEvents = cur.nEvents + 1L)
        }
      }
      state.update(cur)
      // expire at gap past last activity; the timeout timestamp must sit
      // beyond the current watermark or the runtime rejects it
      state.setTimeoutTimestamp(math.max(cur.lastUs / 1000L + gapUs / 1000L,
        state.getCurrentWatermarkMs() + 1L))
      out += SessionOut(userId, cur.sessionIdx, cur.nEvents, cur.startUs,
        cur.lastUs, closed = false)
      out.iterator
    }

    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", lateness)
      .as[Evt]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
