package graft.wat

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ProcessWatSpec extends AnyFunSuite {

  private val tmp = Files.createTempDirectory("processwat").toFile
  private val fixturePath =
    WatFixture.write(new File(tmp, "fixture.warc.wat.gz").getAbsolutePath)

  test("md5Hex matches an independently computed vector") {
    assert(ProcessWat.md5Hex("a cat" + "https://example.com/base/img/cat.jpg")
      == WatFixture.CatUid)
  }

  for ((dt, (pre, post, sampleUid)) <- WatFixture.golden) {
    test(s"golden extraction for document_type=$dt") {
      val rows = ProcessWat(fixturePath, dt).toList
      assert(rows.size == pre, s"pre-dedup rows for $dt: $rows")
      assert(rows.map(_.uid).distinct.size == post)
      assert(rows.exists(_.uid == sampleUid))
      assert(rows.forall(r => r.url.startsWith("http://") ||
        r.url.startsWith("https://")))
      assert(rows.forall(r => r.uid == ProcessWat.md5Hex(r.alt + r.url)))
    }
  }

  test("image requires non-empty alt; image_only does not") {
    val image = ProcessWat(fixturePath, "image").toList
    val imageOnly = ProcessWat(fixturePath, "image_only").toList
    assert(image.forall(_.alt.nonEmpty))
    assert(imageOnly.exists(_.alt.isEmpty))
  }

  test("query-string text url is rejected by split-on-dot semantics") {
    val text = ProcessWat(fixturePath, "text").toList
    assert(!text.exists(_.url.contains("?")))
  }

  test("unknown document type throws") {
    intercept[IllegalArgumentException] {
      ProcessWat(fixturePath, "nope").toList
    }
  }
}
