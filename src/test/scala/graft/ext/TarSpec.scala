package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ustar parser/muxer + WebDataset member explosion: roundtrips
  * (padding, >512-byte members, empty members), checksum validation,
  * key/ext split convention, hostile input rejection.
  */
class TarSpec extends AnyFunSuite with SparkTestBase {

  private val entries = Seq(
    ("0001.jpg", Array.fill(700)(7.toByte)),   // spans 2 blocks
    ("0001.txt", "a caption".getBytes("UTF-8")),
    ("0001.seg.json", "{}".getBytes("UTF-8")), // multi-dot ext
    ("0002.jpg", Array.empty[Byte]),           // empty member
    ("0002.txt", Array.fill(511)(3.toByte)))   // one byte under a block

  test("roundtrip: names, sizes, exact windows, padding") {
    val tar = Tar.write(entries)
    assert(Tar.isTar(tar))
    assert(tar.length % 512 == 0)
    val ms = Tar.members(tar)
    assert(ms.map(_.name) == entries.map(_._1).toVector)
    assert(ms.map(_.size) == entries.map(_._2.length.toLong).toVector)
    for ((m, (_, data)) <- ms.zip(entries)) {
      val w = tar.slice(m.offset.toInt, (m.offset + m.size).toInt)
      assert(w.sameElements(data), s"${m.name} window reads wrong bytes")
    }
  }

  test("checksum validation: a corrupted header ends the walk closed") {
    val tar = Tar.write(entries)
    val bad = tar.clone()
    bad(30) = 'X'.toByte // inside the first header's name field
    assert(Tar.members(bad).isEmpty)
    // corrupt the SECOND header: first member still parses
    val bad2 = tar.clone()
    val secondHeader = 512 + 1024 // 700-byte payload padded to 1024
    bad2(secondHeader + 40) = 'X'.toByte
    assert(Tar.members(bad2).map(_.name) == Vector("0001.jpg"))
    // truncations never throw
    for (cut <- Seq(0, 100, 511, 513, tar.length / 2, tar.length - 100))
      Tar.members(tar.take(cut))
    assert(!Tar.isTar("not a tar".getBytes("UTF-8")))
  }

  test("webdatasetMembers: key/ext split at the FIRST dot, samples " +
      "regroupable by key") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      (1L, Tar.write(entries), "application/x-tar"),
      (2L, "not a tar at all".getBytes("UTF-8"), "text/plain")))
      .toDF("doc_id", "bytes", "mime")
    val ms = Multimodal.webdatasetMembers(media)
      .select("doc_id", "key", "ext")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(ms == Seq(
      (1L, "0001", "jpg"), (1L, "0001", "seg.json"), (1L, "0001", "txt"),
      (1L, "0002", "jpg"), (1L, "0002", "txt")))
    val samples = Multimodal.webdatasetSamples(
      Multimodal.webdatasetMembers(media))
      .select("doc_id", "key", "n_parts")
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(samples == Seq((1L, "0001", 3L), (1L, "0002", 2L)))
  }
  test("Long cursor: a >2 GiB declared size fails closed, no Int wrap") {
    // header declares an 8 GiB payload (octal fits the 12-char field);
    // the walk must end (size > remaining payload) rather than wrap an
    // Int cursor negative and re-enter the header scan
    val tar = Tar.write(Seq(("big.bin", Array.fill(16)(1.toByte))))
    val huge = java.lang.Long.toOctalString(8L * 1024 * 1024 * 1024)
    val padded = ("0" * (11 - huge.length)) + huge + " "
    System.arraycopy(padded.getBytes("US-ASCII"), 0, tar, 124, 12)
    // re-checksum the first header so only the SIZE is hostile
    java.util.Arrays.fill(tar, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += tar(i) & 0xff
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("US-ASCII"),
      0, tar, 148, 6)
    tar(154) = 0; tar(155) = ' '
    assert(Tar.members(tar).isEmpty)
  }
}
