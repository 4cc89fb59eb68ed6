package graft.wat

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class WatReaderSpec extends AnyFunSuite {

  private val tmp = Files.createTempDirectory("watreader").toFile
  private val fixturePath =
    WatFixture.write(new File(tmp, "fixture.warc.wat.gz").getAbsolutePath)

  test("reads every record across gzip members") {
    val bytes = Files.readAllBytes(new File(fixturePath).toPath)
    val recs = WatReader.records(new java.io.ByteArrayInputStream(bytes)).toList
    assert(recs.size == WatFixture.records.size)
    assert(recs.head.warcType == "warcinfo")
  }

  test("metadataPayloads filters by WARC-Type") {
    val payloads = WatReader.metadataPayloads(fixturePath).toList
    assert(payloads.size == WatFixture.records.size - 1)
    assert(payloads.forall(_.nonEmpty))
  }

  test("content-length framing preserves exact payload bytes") {
    val bytes = Files.readAllBytes(new File(fixturePath).toPath)
    val recs = WatReader.records(new java.io.ByteArrayInputStream(bytes)).toList
    val info = recs.find(_.warcType == "warcinfo").get
    assert(info.payloadString == """{"software": "graft-fixture"}""")
  }

  test("fetch of a missing path retries then yields empty") {
    val t0 = System.nanoTime()
    val r = WatReader.fetchAllBytes(s"$tmp/nope.warc.wat.gz",
      attempts = 3, sleepMs = 10)
    assert(r.isEmpty)
    assert((System.nanoTime() - t0) / 1e6 >= 20) // slept between attempts
  }
}
