package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-5 curation operators: semantic dedup, paragraph dedup, URL
  * canonicalization, and the Gopher rule gate.
  */
class CurationOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // --- semDedup ---

  private def prep(rows: Seq[(Long, Seq[Float])]) =
    Similarity.prepared(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding")

  test("semDedup drops the higher id of a near-identical pair, keeps the rest") {
    // centroid 0 ~ (1,0); centroid 1 ~ (0,1). 10/11 are near-identical in
    // cell 0; 12 is distinct in cell 1.
    val corpus = prep(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), // doubling as centroids
      10L -> Seq(0.9f, 0.1f), 11L -> Seq(0.9f, 0.11f),
      12L -> Seq(0.1f, 0.95f)))
    val cents = prep(Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)))
    val kept = Similarity.semDedup(corpus, cents, minCos = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // within cell 0: cos(10,11) ~ 0.99994 >= 0.999 -> 11 drops;
    // cos(0,10) ~ 0.9939 and cos(0,11) ~ 0.9926 stay below the bar;
    // cell 1: cos(1,12) ~ 0.9945 -> 12 survives
    assert(kept == Set(0L, 1L, 10L, 12L))
  }

  test("semDedup: a cell larger than maxCell generates no candidates (cap)") {
    val corpus = prep((0L to 5L).map(i => i -> Seq(1f, 0.001f * i)))
    val cents = prep(Seq(0L -> Seq(1f, 0f)))
    // all 6 vectors share one cell; cap at 5 -> nothing examined
    val kept = Similarity.semDedup(corpus, cents, minCos = 0.5, maxCell = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == (0L to 5L).toSet)
    // without the cap the near-identical vectors collapse to the min id
    val uncapped = Similarity.semDedup(corpus, cents, minCos = 0.5)
      .select("vec_id").as[Long].collect().toSet
    assert(uncapped == Set(0L))
  }

  test("semDedup keeps singletons (cells of one pair with nothing)") {
    val corpus = prep(Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)))
    val cents = prep(Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)))
    val kept = Similarity.semDedup(corpus, cents, minCos = 0.1)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L))
  }

  // --- paragraph dedup ---

  private def paraDedup(rows: Seq[(Long, Seq[String])]) =
    Paragraphs.dedupParagraphs(rows.toDF("doc_id", "paras"), "doc_id",
      col("paras"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("a paragraph seen earlier is removed from every later document") {
    val got = paraDedup(Seq(
      1L -> Seq("alpha beta", "gamma"),
      2L -> Seq("gamma", "delta"),
      3L -> Seq("delta", "alpha beta", "epsilon")))
    assert(got === Array(
      (1L, 2L, 2L, "alpha beta\ngamma"),
      (2L, 2L, 1L, "delta"),
      (3L, 3L, 1L, "epsilon")))
  }

  test("first occurrence is by (doc_id, pos), repeats inside one doc collapse") {
    val got = paraDedup(Seq(1L -> Seq("x", "y", "x", "x")))
    assert(got === Array((1L, 4L, 2L, "x\ny")))
  }

  test("all-duplicate and empty documents survive with empty text") {
    val got = paraDedup(Seq(
      1L -> Seq("x"),
      2L -> Seq("x"),
      3L -> Seq.empty[String]))
    assert(got === Array(
      (1L, 1L, 1L, "x"),
      (2L, 1L, 0L, ""),
      (3L, 0L, 0L, "")))
  }

  test("a hot paragraph planted in EVERY document keeps exactly its first occurrence") {
    // the distribution this operator exists for: one boilerplate block
    // repeated across the whole corpus — previously a single-partition
    // row_number sort over the entire hot group
    val got = paraDedup((1L to 200L).map(i =>
      i -> Seq("cookie banner", s"unique $i")))
    assert(got.length === 200)
    assert(got.count(_._4.contains("cookie banner")) === 1)
    assert(got.head === ((1L, 2L, 2L, "cookie banner\nunique 1")))
    assert(got.tail.forall { case (id, np, nk, t) =>
      np == 2L && nk == 1L && t == s"unique $id" })
  }

  test("dedupParagraphs matches a sequential reference on random corpora") {
    // oracle-independent: a plain Scala walk in (doc_id, pos) order,
    // first occurrence wins — the declarative min-struct plan must
    // reproduce it exactly on heavily-duplicated random corpora
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val corpus = (1L to (1 + rnd.nextInt(12)).toLong).map { id =>
        id -> Seq.fill(rnd.nextInt(6))(s"p${rnd.nextInt(5)}")
      }
      val seen = scala.collection.mutable.Set.empty[String]
      val expect = corpus.sortBy(_._1).map { case (id, ps) =>
        val kept = ps.filter(p => seen.add(p))
        (id, ps.size.toLong, kept.size.toLong, kept.mkString("\n"))
      }
      assert(paraDedup(corpus).toSeq == expect, s"trial $trial: $corpus")
    }
  }

  test("dedupParagraphs survivor pick is a combinable aggregation, not a hot-key window") {
    val plan = Paragraphs.dedupParagraphs(
      Seq(1L -> Seq("a")).toDF("doc_id", "paras"), "doc_id", col("paras"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      "hot-key row_number window crept back into dedupParagraphs")
    assert(plan.contains("partial_min"),
      s"expected a map-side partial min on ph:\n${plan.take(2000)}")
  }

  test("semDedupAudited counts capped-out cells and their unexamined vectors") {
    val corpus = prep((0L to 5L).map(i => i -> Seq(1f, 0.001f * i)) :+
      (10L -> Seq(0f, 1f)))
    val cents = prep(Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)))
    // cell 0 holds 6 vectors, cap 5 -> capped out; cell 1 is a singleton
    val (kept, audit) = Similarity.semDedupAudited(corpus, cents,
      minCos = 0.5, maxCell = 5)
    assert(kept.count() === 7L) // everything survives UNEXAMINED
    val a = audit.head()
    assert(a.getLong(0) === 1L && a.getLong(1) === 6L)
    // uncapped run: the audit must say 0/0, not null
    val (_, clean) = Similarity.semDedupAudited(corpus, cents, minCos = 0.5)
    val c = clean.head()
    assert(c.getLong(0) === 0L && c.getLong(1) === 0L)
  }

  test("cdcSegments: boundaries are content-defined and edit-local") {
    def segs(text: String, bits: Int = 4): Seq[String] =
      Seq(text).toDF("t")
        .select(TextAnalysis.cdcSegments(split(col("t"), " "), bits).as("s"))
        .collect()(0).getSeq[String](0)
    // reconstruction: chunks concatenated == original token stream
    val t = "the quick brown fox jumps over the lazy dog again and again"
    assert(segs(t).mkString(" ") === t)
    // maskBits=1 (every token with even h32 closes a chunk) still
    // reconstructs; empty text has no chunks
    assert(segs(t, bits = 1).mkString(" ") === t)
    assert(segs("").mkString(" ") === "")
    // edit-locality: an inserted PREFIX shifts fixed windows but CDC
    // suffix chunks after the first boundary are unchanged
    val base = segs(t, bits = 1)
    val edited = segs("zzz " + t, bits = 1)
    assert(base.nonEmpty && edited.nonEmpty)
    if (base.size > 1) {
      // every base chunk except possibly the first survives verbatim
      assert(base.tail.forall(edited.contains),
        s"suffix chunks not preserved: base=$base edited=$edited")
    }
  }

  // --- URL canonicalization ---

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(UrlAnalysis.canonicalUrl(col("url")).as("c"))
      .as[String].head()

  test("canonicalUrl lowercases scheme+host and strips default ports") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path") ===
      "https://www.example.com/Path")
    assert(canon("http://a.test:80/x") === "http://a.test/x")
    // non-default port survives
    assert(canon("http://a.test:8080/x") === "http://a.test:8080/x")
    // https on :80 is NOT a default port
    assert(canon("https://a.test:80/x") === "https://a.test:80/x")
  }

  test("canonicalUrl drops fragment + tracking params and sorts the rest") {
    assert(canon("https://a.test/p?z=1&utm_source=x&a=2#frag") ===
      "https://a.test/p?a=2&z=1")
    assert(canon("https://a.test/p?gclid=abc&fbclid=d") === "https://a.test/p")
    // ref is tracking; a parameter merely CONTAINING ref= is not
    assert(canon("https://a.test/p?ref=nav&href=x") ===
      "https://a.test/p?href=x")
  }

  test("canonicalUrl normalizes empty path to / and keeps case in path/query") {
    assert(canon("https://A.test") === "https://a.test/")
    assert(canon("https://a.test?b=1") === "https://a.test/?b=1")
    assert(canon("https://a.test/CaseSensitive?Q=Vv") ===
      "https://a.test/CaseSensitive?Q=Vv")
  }

  // --- gopher gate ---

  private def gate(text: String, minTokens: Long = 2L,
      maxTokens: Long = 1000L): Row =
    Seq(text).toDF("text")
      .select(TextAnalysis.gopherGate(split(col("text"), " "), minTokens,
        maxTokens).as("g"))
      .select("g.*").head()

  test("gopherGate thresholds are inclusive and exact") {
    // 5 tokens of length exactly 3 -> mean 3.0, inclusive lower bound
    val r1 = gate("aaa bbb ccc ddd the")
    assert(r1.getAs[Boolean]("r_word_len"))
    assert(r1.getAs[Boolean]("r_stopword"))
    assert(r1.getAs[Boolean]("kept"))
    // top share exactly 1/5 = 0.2 passes; 2/5 fails
    assert(gate("the b c d e").getAs[Boolean]("r_top_share"))
    assert(!gate("the the c d e").getAs[Boolean]("r_top_share"))
    // mean length 2.8 < 3 fails
    assert(!gate("aa bbb ccc ddd the").getAs[Boolean]("r_word_len"))
  }

  test("gopherGate flags repetition and missing stopwords independently") {
    val r = gate("foo foo foo foo foo foo")
    assert(!r.getAs[Boolean]("r_dup_bigram"))
    assert(!r.getAs[Boolean]("r_top_share"))
    assert(!r.getAs[Boolean]("r_stopword"))
    assert(r.getAs[Boolean]("r_len"))
    assert(!r.getAs[Boolean]("kept"))
  }

  test("gopherGate token-count bounds") {
    assert(!gate("the aaa", minTokens = 3L).getAs[Boolean]("r_len"))
    assert(!gate("the aaa bbb ccc", maxTokens = 3L).getAs[Boolean]("r_len"))
  }

  // --- perceptual hashes + banded hamming LSH ---

  private def pngOf(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash/dHash: identical bytes collide, a rescaled copy stays within a few bits, opposites differ widely") {
    // a horizontal gradient with a dark band — structure both hashes see
    val grad = pngOf(64, 64)((x, y) =>
      if (y >= 24 && y < 40) 0x000000
      else { val v = x * 4; (v << 16) | (v << 8) | v })
    val rescaled = Multimodal.resizeImage(grad, 32, 32).get
    val inverse = pngOf(64, 64)((x, y) =>
      if (y >= 24 && y < 40) 0xffffff
      else { val v = 255 - x * 4; (v << 16) | (v << 8) | v })

    val (a1, a2, a3) = (Multimodal.aHash(grad).get,
      Multimodal.aHash(rescaled).get, Multimodal.aHash(inverse).get)
    assert(Multimodal.aHash(grad).get == a1) // deterministic
    assert(java.lang.Long.bitCount(a1 ^ a2) <= 6,
      s"rescaled copy drifted ${java.lang.Long.bitCount(a1 ^ a2)} bits")
    assert(java.lang.Long.bitCount(a1 ^ a3) >= 20,
      s"inverse image unexpectedly close: ${java.lang.Long.bitCount(a1 ^ a3)}")

    val (d1, d2) = (Multimodal.dHash(grad).get, Multimodal.dHash(rescaled).get)
    assert(java.lang.Long.bitCount(d1 ^ d2) <= 6)
    // non-image payloads yield no hash
    assert(Multimodal.aHash("text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dHash("text".getBytes("UTF-8")).isEmpty)
  }

  test("perceptualHashes + hammingNearDupPairs find the visual near-dup pair") {
    val grad = pngOf(64, 64)((x, y) =>
      if (y >= 24 && y < 40) 0x000000
      else { val v = x * 4; (v << 16) | (v << 8) | v })
    val rescaled = Multimodal.resizeImage(grad, 32, 32).get
    val inverse = pngOf(64, 64)((x, y) =>
      if (y >= 24 && y < 40) 0xffffff
      else { val v = 255 - x * 4; (v << 16) | (v << 8) | v })
    val media = Seq((1L, grad), (2L, rescaled), (3L, inverse),
      (4L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "bytes")
    val hashes = Multimodal.perceptualHashes(media)
    assert(hashes.where(col("a_hash").isNull).select("doc_id")
      .as[Long].collect().toSeq == Seq(4L))
    val pairs = NearDup.hammingNearDupPairs(
      hashes.where(col("a_hash").isNotNull), "doc_id", "a_hash",
      bands = 4, bandBits = 16, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("hammingNearDupPairs: pigeonhole recall, threshold cut, bucket cap, multi-band dedup") {
    val rows = Seq(
      10L -> 0x0F0F0F0F0F0FL,       // base
      11L -> 0x0F0F0F0F0F0EL,       // distance 1 from base
      12L -> 0x0F0F0F0F0F00L,       // distance 4 from 10, 3 from 11
      20L -> 0x111111111111L).toDF("id", "h")
    val got = NearDup.hammingNearDupPairs(rows, "id", "h",
      bands = 4, bandBits = 12, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (10,11) collide in THREE bands but appear once, at distance 1;
    // (10,12) at distance 4 is cut by the verify; (11,12) survives at 3;
    // 20 pairs with nothing
    assert(got == Set((10L, 11L, 1L), (11L, 12L, 3L)))
    // cap: four identical hashes -> every band bucket holds 4 > maxBucket
    val hot = Seq(1L, 2L, 3L, 4L).map(_ -> 0xABCL).toDF("id", "h")
    val capped = NearDup.hammingNearDupPairs(hot, "id", "h",
      bands = 4, bandBits = 12, maxDist = 3, maxBucket = 3)
    assert(capped.count() == 0)
    // invalid parameters fail loudly
    intercept[IllegalArgumentException] {
      NearDup.hammingNearDupPairs(rows, "id", "h",
        bands = 4, bandBits = 12, maxDist = 4)
    }
  }

  test("tokenBudgetSelect: greedy-by-class knapsack invariants") {
    import org.apache.spark.sql.functions.{col, split}
    val docs = graft.queries.QueryUtil
      .table(spark, "/root/testdata/sf0.001", "documents")
    val budget = 25000L
    val got = Curation.tokenBudgetSelect(docs, "doc_id",
        split(col("text"), " "), budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty && got.exists(_._4) && got.exists(!_._4),
      "budget must split the corpus non-trivially")
    val selTokens = got.filter(_._4).map(_._2).sum
    assert(selTokens <= budget, s"selected $selTokens > budget $budget")
    // greedy optimality at class granularity: every selected class
    // scores strictly above every unselected class, and admitting the
    // best unselected class would break the budget
    val selScores = got.filter(_._4).map(_._3)
    val unselScores = got.filterNot(_._4).map(_._3)
    assert(selScores.min > unselScores.max)
    val bestUnsel = unselScores.max
    val bestUnselTokens = got.filterNot(_._4)
      .filter(_._3 == bestUnsel).map(_._2).sum
    assert(selTokens + bestUnselTokens > budget,
      "the boundary class must genuinely not fit")
  }
}
