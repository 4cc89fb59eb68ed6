package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ExtSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the mat sat on the cat"),   // same word set as 1
    (3L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("bag fingerprint collides exactly on equal word sets") {
    val fp = docs.select(col("doc_id"),
      TextAnalysis.bagFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("banding math: s-curve is monotone and bandingFor hits the threshold") {
    // monotone in j: more similar pairs are more likely candidates
    val ps = (1 to 9).map(i => NearDup.bandHitProbability(i / 10.0, 4, 2))
    assert(ps == ps.sorted)
    // bandingFor picks a factorization whose inflection ~ threshold
    val (b, r) = NearDup.bandingFor(numHashes = 8, threshold = 0.5)
    assert(b * r == 8)
    assert(math.abs(math.pow(1.0 / b, 1.0 / r) - 0.5) < 0.25)
    // extremes: near-exact threshold wants many rows per band (high
    // precision); loose threshold wants many bands (high recall)
    val (bHi, rHi) = NearDup.bandingFor(16, 0.95)
    val (bLo, rLo) = NearDup.bandingFor(16, 0.1)
    assert(rHi > rLo && bLo > bHi)
    // property over random budgets: every result factorizes exactly
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(64)
      val t = 0.05 + rnd.nextDouble() * 0.9
      val (bb, rr) = NearDup.bandingFor(n, t)
      assert(bb * rr == n && bb >= 1 && rr >= 1)
    }
  }

  test("minhash signature is set-based (word order invariant)") {
    val hs = transform(array_distinct(split(col("text"), " ")),
      w => graft.functions.Hashing.h32(w))
    val sig = docs.select(col("doc_id") +:
      NearDup.minhashSignature(hs, 4): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("typed MinHash aggregator over exploded tokens == HOF signature") {
    import org.apache.spark.sql.functions.udaf
    val hs = transform(array_distinct(split(col("text"), " ")),
      w => graft.functions.Hashing.h32(w))
    val hof = docs.select(col("doc_id") +:
      NearDup.minhashSignature(hs, 4): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap

    val agg = udaf(new MinHashAgg(4))
    val rows = docs
      .select(col("doc_id"), explode(hs).as("h"))
      .groupBy("doc_id").agg(agg(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(rows == hof)
  }

  test("simhash: identical word sets share a signature; signature is 16-bit") {
    val sh = NearDup.simhash(docs, Seq("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("bigram shingles: n tokens -> n-1 shingles (distinct)") {
    val got = Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select(NearDup.bigramShingles(split(col("text"), " ")).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a b", "b c", "c d"))
  }

  test("jaccard overlap: identical sets -> inter == union") {
    val d = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("w"))
    val a = d.select(col("doc_id").as("d1"), col("w").as("wa"))
    val b = d.select(col("doc_id").as("d2"), col("w").as("wb"))
    val (inter, union) = NearDup.setOverlap(col("wa"), col("wb"))
    val rows = a.crossJoin(b).where(col("d1") === 1 && col("d2") === 2)
      .select(inter.as("i"), union.as("u")).collect()(0)
    assert(rows.getLong(0) == rows.getLong(1)) // same set
  }

  test("lsh near-dup: same-set docs pair with jac 1.0; singletons don't") {
    val pairs = NearDup.lshNearDupPairs(docs, col("doc_id"),
      TextAnalysis.distinctTokens(col("text")), bands = 4, rowsPerBand = 2,
      maxBucket = 10, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0))) // doc 3 shares no bucket
    intercept[IllegalArgumentException] {
      NearDup.lshNearDupPairs(docs, col("doc_id"),
        TextAnalysis.distinctTokens(col("text")), 4, 2, 10, minJaccard = 0.0)
    }
  }

  test("repetition signals: duplicate bigrams and top-token share") {
    val d = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab -> 2 distinct of 5
      (2L, "x"),             // no bigrams -> ratio 0.0
      (3L, "u v w x y z")    // all distinct
    ).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
      TextAnalysis.dupBigramRatio(col("text")).as("r"),
      TextAnalysis.topTokenShare(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((1.0 - 2.0 / 5.0, 3.0 / 6.0)))
    assert(got(2L) == ((0.0, 1.0)))
    assert(got(3L) == ((0.0, 1.0 / 6.0)))
  }

  test("cosine of a vector with itself is exactly 1.0 after quantization") {
    val emb = Seq((0L, Array(0.1f, -0.2f, 0.3f)), (1L, Array(0.5f, 0.5f, 0.1f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.prepared(emb, "vec_id", "embedding")
    val self = p.as("a").crossJoin(p.as("b"))
      .where(col("a.vec_id") === col("b.vec_id"))
      .select(Similarity.cosine(
        Similarity.dotq(col("a.qv"), col("b.qv")),
        col("a.n2"), col("b.n2")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(_ == 1.0))
  }

  test("brute-force topk returns k neighbors ranked by cosine") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.prepared(emb, "vec_id", "embedding")
    val top = Similarity.bruteForceTopK(p, p.where(col("vec_id") === 0), 2)
      .collect().map(r => (r.getLong(2), r.getLong(1)))
    assert(top.toSeq == Seq((3L, 1L), (1L, 2L))) // 3 closest, then 1
  }

  test("multimodal: real PNG decode, resize, and WAV parse via JDK codecs") {
    // a 3x2 PNG: top row white, bottom row black
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 3).foreach { x =>
      img.setRGB(x, 0, 0xffffff)
      img.setRGB(x, 1, 0x000000)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val (w, h, feat) = Multimodal.decodeImage(png).get
    assert((w, h) == ((3, 2)))
    assert(feat.head > 0.99f && feat.last < 0.01f) // white band, black band

    val resized = Multimodal.resizeImage(png, 5, 4).get
    val (rw, rh, _) = Multimodal.decodeImage(resized).get
    assert((rw, rh) == ((5, 4)))

    // distributed path: the PNG decodes for real, text falls back to stub
    val media = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "bytes")
    val feats = Multimodal.extractFeatures(media)
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(feats(1L) == ((3, 2)))
    assert(feats(2L)._1 >= 64) // stub pseudo-dimensions

    // a minimal 16-bit mono 8kHz WAV: four samples of known amplitude
    val samples = Seq[Short](16384, -16384, 16384, -16384)
    val dataLen = samples.length * 2
    val wav = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(wav.putShort)
    val (rate, ch, n, meanAbs) = Multimodal.decodeWav(wav.array()).get
    assert((rate, ch, n) == ((8000, 1, 4L)))
    assert(math.abs(meanAbs - 0.5) < 0.001) // 16384/32768

    val audio = Seq((1L, wav.array()), (2L, png)).toDF("doc_id", "bytes")
    val af = Multimodal.extractAudioFeatures(audio).collect()
    assert(af.map(_.doc_id).toSeq == Seq(1L)) // PNG row dropped
    assert(af.head.sample_rate == 8000)

    // hostile chunk length (0xFFFFFFFF) must terminate, not loop
    val evil = wav.array().clone()
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1
    assert(Multimodal.decodeWav(evil).isEmpty)
  }

  test("multimodal: binaryFile directory ingestion feeds real decode") {
    val dir = java.nio.file.Files.createTempDirectory("mmdir").toFile
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "a.png"))
    java.nio.file.Files.write(new java.io.File(dir, "b.txt").toPath,
      "not media".getBytes("UTF-8"))
    val media = Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
    assert(media.count() == 2)
    val pngOnly = Multimodal.readBinaryDir(spark, dir.getAbsolutePath, "*.png")
    assert(pngOnly.count() == 1) // glob pushes to the file listing
    val row = pngOnly.collect()(0)
    assert(row.getAs[String]("mime") == "image/png")
    val feats = Multimodal.extractFeatures(pngOnly)
      .collect().map(f => (f.width, f.height))
    assert(feats.toSeq == Seq((4, 4))) // REAL decode, not the stub
    // and a real MP4 in the same directory rides the container parser:
    // ingest -> mime -> videoMeta, end to end from files on disk
    java.nio.file.Files.write(new java.io.File(dir, "c.mp4").toPath,
      Mp4.write(Mp4.BuildSpec(width = 64, height = 48,
        sampleSizes = Seq(10, 20, 30), syncEvery = 3)))
    val mp4Only = Multimodal.readBinaryDir(spark, dir.getAbsolutePath, "*.mp4")
    assert(mp4Only.collect()(0).getAs[String]("mime") == "video/mp4")
    val vm = Multimodal.videoMeta(mp4Only).collect()
    assert(vm.length == 1 && vm(0).width == 64 && vm(0).height == 48 &&
      vm(0).n_samples == 3 && vm(0).n_keyframes == 1)
  }

  test("multimodal: stubbed decode is deterministic with fixed shape") {
    val media = Multimodal.asMedia(
      Seq((7L, "hello world")).toDF("doc_id", "text"), "doc_id", "text")
    val f = Multimodal.extractFeatures(media).collect()(0)
    assert(f.doc_id == 7L && f.byte_len == 11L)
    assert(f.feature.length == 8)
    val again = Multimodal.extractFeatures(media).collect()(0)
    assert(f == again.copy(feature = f.feature) && f.feature.sameElements(again.feature))
    assert(f.width == 64 + 11 % 577 && f.height == 64 + (11 * 7) % 417)
  }

  test("multimodal resize + frame-sample stages keep plumbing shape") {
    val media = Multimodal.asMedia(
      Seq((1L, "x" * 300)).toDF("doc_id", "text"), "doc_id", "text")
    val resized = Multimodal.resize(media, 128, 128).collect()(0)
    assert(resized.getInt(2) == 128 && resized.getInt(3) == 128)
    assert(resized.getAs[Array[Byte]](1).length == 128 * 128 / 64)

    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    // 300 bytes → 5 windows of 64 → indices 0,2,4 sampled
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(frames.length == 3)
  }

  test("rolling fingerprint is order-sensitive; bag fingerprint is not") {
    val fp = docs.select(col("doc_id"),
      TextAnalysis.rollingFingerprint(col("text")).as("roll"),
      TextAnalysis.bagFingerprint(col("text")).as("bag"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(fp(1L)._2 == fp(2L)._2) // same bag
    assert(fp(1L)._1 != fp(2L)._1) // different order → different roll
  }

  test("curation drops low-quality docs, exact bag-dups, and near-dups") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs away into the deep dark forest to find some food for dinner"
    val rows = Seq(
      (1L, base, "en"),                               // survivor
      (2L, base.split(' ').reverse.mkString(" "), "en"), // bag-dup of 1 → dropped
      (3L, base + " tonight", "en"),                  // near-dup of 1 → dropped
      (4L, "short text", "en"),                       // too few tokens → dropped
      (5L, "a completely different long document about query engines " +
        "and the many ways of joining sorting grouping and shuffling " +
        "big data tables in a distributed cluster setting", "en"))
      .map { case (id, t, l) => (id, t, l, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = Curation.curate(rows,
      Curation.Config(minTokens = 10, minScore = 0.0, blockChars = 1000,
        minJaccard = 0.8))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 5L))
  }

  test("kmeans centroid training converges to exact integer cluster means") {
    // two tight clusters on orthogonal axes; init with one member of each
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.998f, 0.02f)), (3L, Seq(0.996f, -0.02f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.02f, 0.998f)), (6L, Seq(-0.02f, 0.996f))
    ).toDF("vec_id", "embedding")
    val p = Similarity.prepared(vecs, "vec_id", "embedding")
    val init = p.where(col("vec_id") === 1 || col("vec_id") === 4)
    val cents = Similarity.kmeansCentroids(p, init, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // exact elementwise floor-means of the quantized members
    assert(cents(1L) == Seq((1000L + 998L + 996L) / 3, (0L + 20L - 20L) / 3))
    assert(cents(4L) == Seq((0L + 20L - 20L) / 3, (1000L + 998L + 996L) / 3))
  }

  test("embedding near-dup drops degenerate sign buckets before pairing") {
    // 5 near-identical vectors share one sign bucket (the template-content
    // hot bucket that would go quadratic at scale); 2 others share a cold
    // bucket. maxBucket = 4 must drop the hot bucket ENTIRELY.
    val hot = (1L to 5L).map(i => (i, Seq(1.0f, 0.01f * i)))
    val cold = Seq((10L, Seq(-1.0f, -0.5f)), (11L, Seq(-0.99f, -0.52f)))
    val p = Similarity.prepared(
      (hot ++ cold).toDF("vec_id", "embedding"), "vec_id", "embedding")
    val capped = Similarity
      .nearDupPairs(p, sigBits = 2, minCos = 0.9, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((10L, 11L)))
    val uncapped = Similarity
      .nearDupPairs(p, sigBits = 2, minCos = 0.9, maxBucket = 100)
    assert(uncapped.count() == 10L + 1L) // C(5,2) hot pairs + the cold pair
  }

  test("kmeans iters=5 completes per-round (no lazy-plan stacking)") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.998f, 0.02f)), (3L, Seq(0.996f, -0.02f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.02f, 0.998f)), (6L, Seq(-0.02f, 0.996f))
    ).toDF("vec_id", "embedding")
    val p = Similarity.prepared(vecs, "vec_id", "embedding")
    val init = p.where(col("vec_id") === 1 || col("vec_id") === 4)
    val out = Similarity.kmeansCentroids(p, init, iters = 5)
    // each round was materialized into a cache the next round plans
    // against, so round 5's plan reads round 4's InMemoryRelation instead
    // of a 5-deep recursive lineage
    assert(out.storageLevel.useMemory)
    val cents = out.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // converged at iter 2; later rounds are fixpoints of the same means
    assert(cents(1L) == Seq((1000L + 998L + 996L) / 3, 0L))
    assert(cents(4L) == Seq(0L, (1000L + 998L + 996L) / 3))
    out.unpersist()
  }

  test("multi-probe IVF recovers a neighbor that 1-probe misses") {
    // centroids along the axes; query leans to c1 but its true nearest
    // neighbor n lives in c2's cell — the classic near-boundary miss
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),  // centroid c1
      (2L, Seq(0.0f, 1.0f)),  // centroid c2
      (3L, Seq(0.6f, 0.8f)),  // n: assigned to c2
      (4L, Seq(0.8f, 0.6f))   // q: assigned to c1
    ).toDF("vec_id", "embedding")
    val p = Similarity.prepared(vecs, "vec_id", "embedding")
    val cents = p.where(col("vec_id") <= 2)
    val assigned = Similarity.ivfAssign(p, cents)
    val oneProbe = Similarity.ivfTopK(assigned, col("vec_id") === 4, k = 1)
      .collect().map(r => r.getLong(2))
    assert(oneProbe.toSeq == Seq(1L)) // stuck with c1's cell-mates
    val qProbes = Similarity.ivfAssignProbes(
      p.where(col("vec_id") === 4), cents, probes = 2)
    val twoProbe = Similarity.ivfTopKProbed(assigned, qProbes, k = 1)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(twoProbe.map(_._1).toSeq == Seq(3L)) // true NN found
    assert(twoProbe.head._2 > 0.95)             // cos(q, n) = 0.96
  }

  test("scrub redacts emails, phones, and ipv4 in order") {
    val rows = Seq(
      (1L, "mail me at a.user+x@sub.example.org or call +41-22-730-5989"),
      (2L, "server 192.168.1.10 and 10.0.0.1 but version 1.2 stays"),
      (3L, "call 555-123-4567 ext nothing; user42@mail.example.com"),
      (4L, "no pii here at all")
    ).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
      Scrub.redact(col("text")).as("r"),
      Scrub.emailCount(col("text")).as("e"),
      Scrub.phoneCount(col("text")).as("p"),
      Scrub.ipv4Count(col("text")).as("i"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == (("mail me at <EMAIL> or call <PHONE>", 1L, 1L, 0L)))
    assert(got(2L) == (("server <IP> and <IP> but version 1.2 stays", 0L, 0L, 2L)))
    assert(got(3L) == (("call <PHONE> ext nothing; <EMAIL>", 1L, 1L, 0L)))
    assert(got(4L) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("ngrams: short docs yield no grams, never negative-index grams") {
    val d = Seq((1L, "a b c d e f"), (2L, "a b c"), (3L, "a")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
      Contamination.ngrams(split(col("text"), " "), 5).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c d e", "b c d e f"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq.empty)
  }

  test("duplicated-ngram share and decontamination find verbatim overlap") {
    val d = Seq(
      (1L, "q w e r t y u i"),              // benchmark doc
      (2L, "x q w e r t y z"),              // shares "q w e r t" with 1
      (3L, "m n o p s t u v"),              // disjoint
      (4L, "a b")                           // too short: 0 grams
    ).toDF("doc_id", "text")
    val share = Contamination.duplicatedNgramShare(d, "doc_id",
      split(col("text"), " "), n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: grams {qwert, werty, ertyu, rtyui}; doc 2 contains qwert+werty
    assert(share(1L) == ((4L, 2L, 0.5)))
    assert(share(2L) == ((4L, 2L, 0.5)))
    assert(share(3L) == ((4L, 0L, 0.0)))
    assert(share(4L) == ((0L, 0L, 0.0)))

    val hits = Contamination.decontaminate(
      d.where(col("doc_id") > 1), d.where(col("doc_id") === 1),
      "doc_id", split(col("text"), " "), n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((2L, 2L))) // only doc 2, via 2 shared grams
  }

  test("splitLeakage counts train grams that appear in any eval split") {
    // explicit split column: 1,2 train; 3 val; 4 test
    val d = Seq(
      (1L, "q w e r t y u i", "train"), // shares "q w e r t","w e r t y" w/ 3
      (2L, "m n o p s t u v", "train"), // disjoint from eval -> 0 leaked
      (3L, "x q w e r t y z", "val"),
      (4L, "m m m m", "test") // too short: no grams
    ).toDF("doc_id", "text", "split")
    val got = Contamination.splitLeakage(d, "doc_id",
      split(col("text"), " "), col("split"), "train")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 2L), (2L, 4L, 0L)))
  }

  test("url analysis: host, registered domain, depth, blocklist") {
    val rows = Seq(
      (1L, "https://img.cdn.example.co/a/b/c.jpg?x=1"),
      (2L, "http://localhost/just"),
      (3L, "not a url at all"),
      (4L, "ftp://files.archive.test/")
    ).toDF("doc_id", "url")
    val got = rows
      .select(col("doc_id"), col("url"),
        UrlAnalysis.host(col("url")).as("h"))
      .select(col("doc_id"), col("h"),
        UrlAnalysis.registeredDomain(col("h")).as("rd"),
        UrlAnalysis.pathDepth(col("url")).as("d"),
        UrlAnalysis.hasQuery(col("url")).as("q"),
        UrlAnalysis.notBlocked(col("h"), Seq("example.co")).as("ok"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    assert(got(1L) == (("img.cdn.example.co", "example.co", 3L, true, false)))
    assert(got(2L) == (("localhost", "localhost", 1L, false, true)))
    assert(got(3L) == (("", "", 0L, false, true))) // non-URL: empty, kept
    assert(got(4L) == (("files.archive.test", "archive.test", 0L, false, true)))
  }

  test("property: sorted-fold topTokenShare == naive max-frequency") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("a", "b", "bb", "", "c c", "Z")
    val gen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word))
    val rows = (1 to 40).map { seed =>
      val ws = gen.apply(Gen.Parameters.default, Seed(seed)).get
      (seed.toLong, ws.mkString(" "))
    }
    val got = rows.toDF("id", "text")
      .select(col("id"), TextAnalysis.topTokenShare(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, text) =>
      val tks = text.split(" ", -1).toSeq
      val want =
        if (tks.isEmpty) 0.0
        else tks.groupBy(identity).values.map(_.size).max.toDouble / tks.size
      assert(got(id) == want, s"id=$id text='$text'")
    }
  }

  test("property: stride-== -width chunks partition the document exactly") {
    val d = Seq((1L, "a b c d e f g"), (2L, "x y z"), (3L, "solo"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("tks"))
    val chunks = d
      .select(col("doc_id"), col("text"), col("tks"),
        posexplode(TextAnalysis.chunkStarts(col("tks"), stride = 3)))
      .select(col("doc_id"), col("text"), col("pos"),
        TextAnalysis.chunkText(col("tks"), col("col"), 3).as("chunk"))
      .collect().groupBy(_.getLong(0))
    chunks.foreach { case (_, rows) =>
      val text = rows.head.getString(1)
      val rebuilt = rows.sortBy(_.getInt(2)).map(_.getString(3)).mkString(" ")
      assert(rebuilt == text) // non-overlapping chunks cover, no gaps
    }
  }

  test("sign signature uses only the first `bits` dimensions") {
    val emb = Seq((0L, Array(1f, -1f, 1f, 999f)), (1L, Array(1f, -1f, 1f, -999f)))
      .toDF("vec_id", "embedding")
    val sigs = emb.select(Similarity.signSignature(col("embedding"), 3).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1)) // dim 4 ignored
    assert(sigs(0) == (1L | 4L))
  }

  test("PQ: donor vectors encode to their own codes; ADC ranks an exact copy first") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),
      (1L, Array(0f, 1f, 1f, 0f)),
      (2L, Array(1f, 0.1f, 0.1f, 1f)), // near donor 0
      (3L, Array(1f, 0f, 0f, 1f))      // exact copy of donor 0
    ).toDF("vec_id", "embedding")
    val p = Similarity.prepared(emb, "vec_id", "embedding")
    val cb = Similarity.pqCodebook(p.where(col("vec_id") < 2), m = 2)
    val codes = Similarity.pqEncode(p, cb, m = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // donors 0/1 must reproduce themselves in every subspace
    for (d <- 0L to 1L; s <- 0 to 1) assert(codes((d, s)) == d)
    // 2 and 3 sit nearest donor 0 in both subspaces
    for (v <- 2L to 3L; s <- 0 to 1) assert(codes((v, s)) == 0L)

    val top = Similarity.pqTopK(codes = Similarity.pqEncode(p, cb, m = 2),
      codebook = cb, queries = p.where(col("vec_id") === 3), m = 2, topK = 3)
      .orderBy("rk").collect()
    // neighbor 0 shares vec 3's codes with table distance 0 → rank by id:
    // ad2(0)=0 exactly; 2 encodes to code 0 too, ad2 = d2(q, donor0) = 0
    // as well (ADC distance is to the CODEBOOK entry, not the neighbor) —
    // ties break by n_id
    assert(top.map(_.getLong(2)).take(2).toSeq == Seq(0L, 2L))
    assert(top.take(2).forall(_.getLong(3) == 0L))
  }

  test("trained PQ codebooks: Lloyd rounds are materialized per-round, " +
      "donor init reproduces pqCodebook at iters=0 semantics, and trained " +
      "ADC beats sampled ADC in aggregate recall on clustered geometry") {
    val p = Similarity.clusteredFixture(spark, 512)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val cbT = Similarity.pqTrainCodebooks(p, m = 4, k = 16, iters = 2)
    // training releases every per-round cache and returns a LOCAL frame
    // (m x k rows) -- repeated callers leak no block-manager entries
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore,
      "pqTrainCodebooks left a cached RDD pinned")
    // every (sub_id, code) is unique and subvector width is dims/m
    val rows = cbT.collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).distinct.length ==
      rows.length)
    assert(rows.forall(_.getSeq[Long](2).length == 4))
    val queries = p.where(col("vec_id").between(8, 31))
    val exact = Similarity.bruteForceTopK(p, queries, k = 3)
    val cbS = Similarity.pqCodebook(p.where(col("vec_id") < 16), m = 4)
    def hits(cb: org.apache.spark.sql.DataFrame): Long =
      Similarity.recallAtK(
        Similarity.pqTopK(Similarity.pqEncode(p, cb, 4), cb, queries,
          m = 4, topK = 3), exact)
        .agg(sum(col("n_hit"))).collect()(0).getLong(0)
    val (hS, hT) = (hits(cbS), hits(cbT))
    assert(hT > hS, s"training must improve aggregate recall: $hT vs $hS")
  }

  test("charBigrams: order kept, duplicates kept, degenerate inputs empty") {
    val got = Seq(("abca", 1), ("x", 2), (null: String, 3), ("", 4))
      .toDF("text", "id")
      .select(col("id"), TextAnalysis.charBigrams(col("text")).as("b"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(got(1) == Seq("ab", "bc", "ca"))
    assert(got(2) == Seq.empty && got(3) == Seq.empty && got(4) == Seq.empty)
  }

  test("winnowing: shared run >= w+k-1 tokens guarantees a shared fingerprint") {
    // w=4, k=3: any shared substring of >= 6 tokens must leave at least
    // one common fingerprint. Docs 1/2 share exactly such a run inside
    // otherwise-disjoint text; doc 3 shares nothing.
    val shared = "one two three four five six"
    def doc(id: Long, text: String) = (id, text)
    val docs = Seq(
      doc(1L, s"alpha beta $shared gamma delta"),
      doc(2L, s"p q r s $shared t u v"),
      doc(3L, "completely different words here entirely now"))
      .toDF("doc_id", "text")
    val fps = NearDup.winnowFingerprints(docs, "doc_id",
        TextAnalysis.tokens(col("text")), k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((fps(1L) & fps.getOrElse(3L, Set.empty)).isEmpty)
    // density: winnowing keeps a strict subset of the gram hashes
    assert(fps(1L).size < 9) // doc 1 has 9 full windows over 12 grams
    // pair detection end-to-end
    val pairs = NearDup.winnowPairs(docs, "doc_id",
        TextAnalysis.tokens(col("text")), k = 3, w = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("containmentPairs: quoted-short-in-long found where Jaccard misses it") {
    // doc 1 is fully contained in doc 2 (plus 2's own tail); doc 3 is
    // unrelated. Jaccard(1,2) = 4/12 — under any reasonable threshold —
    // but containment(1 ⊆ 2) = 1000.
    val docs = Seq(
      (1L, "en", "a b c d e"),
      (2L, "en", "a b c d e p q r s t u v w x"),
      (3L, "en", "m n o m n o m n o"))
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        NearDup.bigramShingles(TextAnalysis.tokens(col("text"))).as("sh"))
    val got = NearDup.containmentPairs(docs, minContainMilli = 900L,
      maxDf = 10, minGrams = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 1000L))) // directed: 2 ⊄ 1
    // and the symmetric jaccard on the same input stays silent
    val jac = NearDup.jaccardPairs(
      docs.withColumn("bucket", lit(0L)), minJaccard = 0.5, maxDf = 10)
    assert(jac.where(col("d1") === 1L && col("d2") === 2L).count() == 0L)
  }
}
