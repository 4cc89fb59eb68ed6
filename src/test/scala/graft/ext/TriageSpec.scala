package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Cross-format triage: every family of the mixed corpus routes to
  * its parser, hostile blobs verdict "unknown" (total, never throws),
  * ISO-BMFF self-dispatches video vs m4a-audio.
  */
class TriageSpec extends AnyFunSuite with SparkTestBase {

  test("mixed corpus routes every family to the right format") {
    import spark.implicits._
    val ids = spark.createDataset((0L to 25L).map(java.lang.Long.valueOf))
    val rows = Multimodal.mediaTriage(Multimodal.syntheticMixedCorpus(ids))
      .collect().map(r => r.doc_id -> r).toMap
    val want = Map(0L -> "mp4", 1L -> "webm", 2L -> "avi", 3L -> "gif",
      4L -> "audio", 5L -> "tar", 6L -> "zip", 7L -> "pdf",
      8L -> "jpeg", 9L -> "unknown", 10L -> "png", 11L -> "webp",
      12L -> "tiff")
    for (id <- 0L to 25L)
      assert(rows(id).format == want(id % 13), s"id=$id")
    // dims only on the visual families; units per the fixture spec
    assert(rows(13L).width == 16 * (1 + 13 % 5) &&
      rows(13L).n_units == 2 + 13 % 3) // mp4
    assert(rows(17L).width == 0 && rows(17L).n_units == 100 + 17 % 50) // wav
    assert(rows(20L).n_units == 1 + 20 % 2) // pdf pages
    assert(rows(22L).n_units == 0) // unknown
    // png/webp/tiff: dims + frame/page rotation by id/13
    assert(rows(10L).width == 16 && rows(10L).n_units == 1) // 10/13=0
    assert(rows(23L).n_units == 2) // 23/13=1 → apng 2 frames
    assert(rows(11L).n_units == 1) // 11/13=0 → vp8 still
    assert(rows(24L).n_units == 1) // 24/13=1 → vp8l still
    assert(rows(12L).n_units == 1 && rows(12L).width == 48) // 12/13=0
    assert(rows(25L).n_units == 2 && // 25/13=1 → 2-page packbits tiff
      rows(25L).width == 16 * (1 + 25 % 5))
    // triage is TOTAL: one row per input blob
    assert(rows.size == 26)
  }

  test("ISO-BMFF self-dispatch: m4a routes to audio with unit count") {
    // reuse the audio fixture's m4a family (id%5 == 4)
    import spark.implicits._
    val ids = spark.createDataset(Seq(java.lang.Long.valueOf(9L))) // 9%5=4
    val media = Multimodal.syntheticAudioMedia(ids)
    val r = Multimodal.mediaTriage(media).collect().head
    assert(r.format == "audio" && r.n_units == 4 + 9 % 7)
  }

  test("hostile payloads verdict unknown, never throw") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val junk = Array.fill(rnd.nextInt(2048))(rnd.nextInt(256).toByte)
      val r = Multimodal.describeAny(trial.toLong, junk)
      assert(r.doc_id == trial.toLong) // total: always a row
    }
    // a sniffed-but-truncated container is unknown, not a crash
    val mp4 = Mp4.write(Mp4.BuildSpec(64, 48, Seq(50, 51), syncEvery = 2))
    val r = Multimodal.describeAny(1L, mp4.take(24))
    assert(r.format == "unknown")
  }
}
