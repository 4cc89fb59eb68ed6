package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsofRangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("asof: equal-ts right matches, max tiebreak wins, no-prior is null") {
    val left = Seq(
      (10L, 1L, 100L), // after rights at 50 and 100 -> matches ts=100
      (11L, 1L, 60L),  // between rights -> matches ts=50
      (12L, 1L, 40L),  // before any right -> null
      (13L, 2L, 100L)  // user 2: two rights at ts=100 -> max id (22) wins
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (1L, 50L, 20L, 5.0),
      (1L, 100L, 21L, 6.0),
      (2L, 100L, 22L, 7.0),
      (2L, 100L, 23L, 8.0)
    ).toDF("user_id", "ts_us", "purchase_id", "purchase_value")
    val got = AsofJoin.asof(left, right, "user_id", "ts_us",
      Seq("purchase_id", "purchase_value"), tieBreak = "purchase_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4)))))
      .toMap
    assert(got(10L) == Some((21L, 6.0)))
    assert(got(11L) == Some((20L, 5.0)))
    assert(got(12L) == None)
    assert(got(13L) == Some((23L, 8.0))) // highest tiebreak at equal ts
  }

  test("asof: a null payload VALUE stays with its own row, never mixed") {
    val left = Seq((1L, 1L, 30L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (1L, 10L, 30L, Option(5.0)),
      (1L, 20L, 31L, Option.empty[Double]) // latest purchase has null value
    ).toDF("user_id", "ts_us", "purchase_id", "purchase_value")
    val r = AsofJoin.asof(left, right, "user_id", "ts_us",
      Seq("purchase_id", "purchase_value"), tieBreak = "purchase_id")
      .collect()(0)
    assert(r.getLong(3) == 31L)
    assert(r.isNullAt(4)) // NOT 5.0 filled in from the older purchase
  }

  test("property: asof matches the naive latest-at-or-before definition") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      nL <- Gen.choose(5, 40)
      nR <- Gen.choose(0, 40)
      lefts <- Gen.listOfN(nL, for {
        u <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 50L)
      } yield (u, t))
      rights <- Gen.listOfN(nR, for {
        u <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0, 99)
      } yield (u, t, v.toDouble))
    } yield (lefts, rights)
    (1 to 5).foreach { seed =>
      val (lefts, rights) = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val left = lefts.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u, t) }
        .toDF("event_id", "user_id", "ts_us")
      val right = rights.zipWithIndex
        .map { case ((u, t, v), i) => (u, t, 1000L + i, v) }
        .toDF("user_id", "ts_us", "purchase_id", "purchase_value")
      val got = AsofJoin.asof(left, right, "user_id", "ts_us",
        Seq("purchase_id", "purchase_value"), tieBreak = "purchase_id")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      // naive: scan all rights per left row
      val rightRows = rights.zipWithIndex
        .map { case ((u, t, _), i) => (u, t, 1000L + i) }
      lefts.zipWithIndex.foreach { case ((u, t), i) =>
        val want = rightRows
          .filter(r => r._1 == u && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(i.toLong) == want, s"seed=$seed left=$i")
      }
    }
  }

  test("asof/range join: reserved internal column names are rejected") {
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq((1L, 5L, 20L)).toDF("user_id", "ts_us", "purchase_id")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left.withColumn("_asof", lit(1)), right,
        "user_id", "ts_us", Seq("purchase_id"), tieBreak = "purchase_id")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right.withColumn("_payload", lit(1)),
        "user_id", "ts_us", Seq("purchase_id"), tieBreak = "purchase_id")
    }
    val points = Seq(1L).toDF("p")
    val intervals = Seq((1L, 0L, 5L)).toDF("iv_id", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("_bucket", lit(1)), "p",
        intervals, "lo", "hi", width = 7)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p",
        intervals.withColumn("_hi1", lit(1)), "lo", "hi", width = 7)
    }
  }

  test("range join: span guard raises on overflow-wide dirty bounds") {
    // lo near Long.MinValue with hi near Long.MaxValue: the raw span
    // hi - lo overflows NEGATIVE, so a raw-span guard would pass and
    // sequence() would blow up opaquely — the bucket-id guard must raise
    // the named error instead
    val points = Seq(1L).toDF("p")
    val dirty = Seq((1L, Long.MinValue + 10L, Long.MaxValue - 10L))
      .toDF("iv_id", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", dirty, "lo", "hi",
        width = 1000L).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("interval span exceeds"))
  }

  test("range join: half-open bounds, bucket spanning, empty intervals") {
    val points = Seq(0L, 6L, 7L, 13L, 14L, 20L).toDF("p")
    val intervals = Seq(
      (1L, 7L, 14L),  // [7,14): contains 7 and 13, not 14 or 6
      (2L, 0L, 21L),  // spans 3 buckets at width 7: all points
      (3L, 5L, 5L)    // empty: matches nothing
    ).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", width = 7)
      .groupBy("iv_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 6L))
    // and no duplicate (point, interval) pairs from multi-bucket spans
    val pairs = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", width = 7).select("p", "iv_id").collect()
    assert(pairs.length == pairs.distinct.length)
  }
}
