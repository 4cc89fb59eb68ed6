package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ZIP parser/muxer + shard stages: stored/deflate roundtrips with
  * CRC verification, EOCD/central-directory hostile-input rejection,
  * ZIP64-marker fail-closed, and the Spark member/text stages.
  */
class ZipSpec extends AnyFunSuite with SparkTestBase {

  private val entries = Seq(
    ("a/one.txt", "hello zip world, compress me please — ok".getBytes("UTF-8"), true),
    ("a/two.bin", Array.tabulate(700)(i => (i % 251).toByte), false),
    ("three.txt", Array.empty[Byte], true),          // empty + deflate
    ("four.bin", Array.empty[Byte], false),          // empty + stored
    ("five.txt", Array.fill(2000)('x'.toByte), true)) // highly compressible

  test("roundtrip: names, methods, sizes, payloads, CRC") {
    val zip = Zip.write(entries)
    assert(Zip.isZip(zip))
    val ms = Zip.members(zip)
    assert(ms.map(_.name) == entries.map(_._1).toVector)
    assert(ms.map(_.method) == entries.map(e => if (e._3) 8 else 0).toVector)
    assert(ms.map(_.uncompSize) == entries.map(_._2.length.toLong).toVector)
    for ((m, (_, data, deflate)) <- ms.zip(entries)) {
      val out = Zip.extract(zip, m)
      assert(out.exists(_.sameElements(data)), s"${m.name} mismatch")
      if (deflate && data.length > 100)
        assert(m.compSize < m.uncompSize, "deflate did not compress")
    }
  }

  test("CRC mismatch fails closed, not wrong bytes") {
    val zip = Zip.write(Seq(("x.bin", Array.fill(64)(9.toByte), false)))
    val m = Zip.members(zip).head
    val bad = zip.clone()
    bad(m.offset.toInt + 3) = 77.toByte // corrupt a stored payload byte
    // the member list still parses (directory is intact)...
    assert(Zip.members(bad).size == 1)
    // ...but extraction sees the checksum miss
    assert(Zip.extract(bad, Zip.members(bad).head).isEmpty)
  }

  test("hostile input: truncations, garbage, lying sizes never throw") {
    val zip = Zip.write(entries)
    for (cut <- 0 to zip.length by 7) Zip.members(zip.take(cut))
    assert(Zip.members("PK not really".getBytes("UTF-8")).isEmpty)
    assert(Zip.members(Array.empty[Byte]).isEmpty)
    // EOCD claiming more entries than the directory extent can hold
    val lying = zip.clone()
    val eocd = lying.length - 22
    lying(eocd + 10) = 0xff.toByte; lying(eocd + 11) = 0x7f.toByte
    assert(Zip.members(lying).isEmpty)
    // ZIP64 escape markers WITHOUT a locator chain behind them (a
    // classic file whose cdOff was stomped to 0xFFFFFFFF) fail closed
    val z64 = zip.clone()
    z64(eocd + 16) = 0xff.toByte; z64(eocd + 17) = 0xff.toByte
    z64(eocd + 18) = 0xff.toByte; z64(eocd + 19) = 0xff.toByte
    assert(Zip.members(z64).isEmpty)
    // a declared uncompressed size past the DEFLATE expansion bound
    // is rejected before allocation
    val ms = Zip.members(zip)
    val blown = ms.head.copy(uncompSize = (1L << 26) + 1)
    assert(Zip.extract(zip, blown).isEmpty)
  }

  test("ZIP64 roundtrip: locator walk + masked central fields resolve") {
    val zip = Zip.write(entries, zip64 = true)
    assert(Zip.isZip(zip))
    val ms = Zip.members(zip)
    assert(ms.map(_.name) == entries.map(_._1).toVector)
    assert(ms.map(_.uncompSize) == entries.map(_._2.length.toLong).toVector)
    for ((m, (_, data, _)) <- ms.zip(entries))
      assert(Zip.extract(zip, m).exists(_.sameElements(data)),
        s"${m.name} mismatch")
    // the classic and zip64 containers carry identical member tables
    val classic = Zip.members(Zip.write(entries))
    assert(ms.map(m => (m.name, m.method, m.compSize, m.uncompSize, m.crc))
      == classic.map(m => (m.name, m.method, m.compSize, m.uncompSize, m.crc)))
  }

  test("ZIP64 hostile: broken locator/record/extra chains fail closed") {
    val zip = Zip.write(entries, zip64 = true)
    // every truncation point fails closed, never throws
    for (cut <- 0 to zip.length by 7) Zip.members(zip.take(cut))
    val eocd = zip.length - 22
    // corrupt the locator signature
    val badLoc = zip.clone()
    badLoc(eocd - 20) = 0.toByte
    assert(Zip.members(badLoc).isEmpty)
    // corrupt the EOCD64 record signature (locator points at garbage)
    val e64 = {
      // the locator's 8-byte offset field
      var v = 0L
      for (k <- 7 to 0 by -1) v = (v << 8) | (zip(eocd - 20 + 8 + k) & 0xffL)
      v.toInt
    }
    val badRec = zip.clone()
    badRec(e64) = 0.toByte
    assert(Zip.members(badRec).isEmpty)
    // entry-count disagreement between the two EOCD64 count fields
    val badN = zip.clone()
    badN(e64 + 24) = (zip(e64 + 24) + 1).toByte
    assert(Zip.members(badN).isEmpty)
    // a masked central field whose 0x0001 extra is missing: stomp the
    // extra header id of the first central entry
    var cdOff = 0L
    for (k <- 7 to 0 by -1) cdOff = (cdOff << 8) | (zip(e64 + 48 + k) & 0xffL)
    val nameLen = (zip(cdOff.toInt + 28) & 0xff) |
      ((zip(cdOff.toInt + 29) & 0xff) << 8)
    val badExtra = zip.clone()
    badExtra(cdOff.toInt + 46 + nameLen) = 0x42.toByte
    assert(Zip.members(badExtra).isEmpty)
    // multi-disk marker in the locator (total disks != 1)
    val badDisk = zip.clone()
    badDisk(eocd - 20 + 16) = 2.toByte
    assert(Zip.members(badDisk).isEmpty)
  }

  test("deflate stream disagreeing with the declared size fails closed") {
    val zip = Zip.write(Seq(("x.txt", Array.fill(300)('y'.toByte), true)))
    val m = Zip.members(zip).head
    // shorter than declared
    assert(Zip.extract(zip, m.copy(uncompSize = m.uncompSize + 5)).isEmpty)
    // longer than declared
    assert(Zip.extract(zip, m.copy(uncompSize = m.uncompSize - 5)).isEmpty)
    // truncated compressed window
    assert(Zip.extract(zip, m.copy(compSize = m.compSize - 2)).isEmpty)
  }

  test("zipArchiveMembers + zipTexts stages over a mixed frame") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      (1L, Zip.write(Seq(
        ("1/a.txt", "alpha".getBytes("UTF-8"), true),
        ("1/b.bin", Array[Byte](5, 6, 7), false))), "application/zip"),
      (2L, "not a zip".getBytes("UTF-8"), "text/plain")))
      .toDF("doc_id", "bytes", "mime")
    val rows = Zip.zipArchiveMembers(media)
      .as[(Long, String, String, Long, Long, Long, Boolean)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(rows == Seq(
      (1L, "1/a.txt", "deflate", 5L, 'a'.toLong, 'a'.toLong, true),
      (1L, "1/b.bin", "stored", 3L, 5L, 7L, true)))
    val texts = Zip.zipTexts(media).as[(Long, String)].collect().toSeq
    assert(texts == Seq((1L, "alpha")))
  }

  test("zipWdsMembers: key/ext split at the FIRST dot, corrupt drops") {
    import spark.implicits._
    val zip = Zip.write(Seq(
      ("a/0001.png", Array[Byte](1, 2, 3), false),
      ("a/0001.seg.json", "{}".getBytes("UTF-8"), true),
      ("0002.txt", "cap".getBytes("UTF-8"), true)))
    val media = spark.createDataset(Seq((7L, zip, "application/zip")))
      .toDF("doc_id", "bytes", "mime")
    val ms = Zip.zipWdsMembers(media)
      .select("doc_id", "key", "ext")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(ms == Seq((7L, "0001", "png"), (7L, "0001", "seg.json"),
      (7L, "0002", "txt")))
  }

  test("synthetic shard spec matches the oracle arithmetic") {
    import spark.implicits._
    val ids = spark.createDataset(Seq(3L, 10L).map(java.lang.Long.valueOf))
    val rows = Zip.zipArchiveMembers(Zip.syntheticZipMedia(ids))
      .as[(Long, String, String, Long, Long, Long, Boolean)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    // id=3: n = 2 + 3%4 = 5 members; id=10: n = 2 + 10%4 = 4
    assert(rows.count(_._1 == 3L) == 5 && rows.count(_._1 == 10L) == 4)
    for ((id, name, method, len, first, last, crcOk) <- rows) {
      val j = name.replaceAll(".*part(\\d+)\\..*", "$1").toLong
      assert(name == s"$id/part$j" + (if (j % 2 == 1) ".txt" else ".bin"))
      assert(method == (if ((id + j) % 2 == 0) "deflate" else "stored"))
      assert(len == 30 + (id * j) % 70)
      assert(first == (id + 2 * j) % 251)
      assert(last == (id + 2 * j + len - 1) % 251)
      assert(crcOk)
    }
  }
}
