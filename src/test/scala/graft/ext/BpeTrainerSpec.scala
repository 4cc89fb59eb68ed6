package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeTrainerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Naive serial BPE reference: greedy left-to-right merge, ties by
    * (count desc, s1, s2).
    */
  private def refBpe(words: Map[String, Long],
      rounds: Int): Seq[(String, String, Long)] = {
    var types: Map[List[String], Long] = words.map { case (w, f) =>
      w.map(_.toString).toList -> f
    }.groupMapReduce(_._1)(_._2)(_ + _)
    (1 to rounds).flatMap { _ =>
      val counts = types.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => (p, f))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) None
      else {
        val ((s1, s2), pf) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        def mergeList(syms: List[String]): List[String] = syms match {
          case a :: b :: rest if a == s1 && b == s2 =>
            (a + b) :: mergeList(rest)
          case a :: rest => a :: mergeList(rest)
          case Nil => Nil
        }
        types = types.toSeq.map { case (syms, f) => (mergeList(syms), f) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        Some((s1, s2, pf))
      }
    }
  }

  test("hand corpus: aaab x2 + ab — run-overlap greedy semantics") {
    // round 1: (a,a)=4 beats (a,b)=3; greedy merges only the FIRST
    //   overlapping (a,a) in "aaab" -> [aa, a, b]
    // round 2: (a,b)=3 (aaab's a·b f2 + ab f1) beats (aa,a)=2
    // round 3: (aa,ab)=2
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = BpeTrainer.learnMerges(docs, "doc_id",
      split(col("text"), " "), rounds = 3)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L)))
  }

  test("distributed == serial reference on random corpora") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val vocab = Seq.fill(12)(
        (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString)
      val words = vocab.groupBy(identity).view
        .mapValues(_.size.toLong * (1 + rnd.nextInt(3))).toMap
      val text = words.toSeq.flatMap { case (w, f) =>
        Seq.fill(f.toInt)(w)
      }.mkString(" ")
      val got = BpeTrainer.learnMerges(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id",
        split(col("text"), " "), rounds = 3)
        .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      val want = refBpe(words, 3)
      assert(got.toSeq == want, s"trial $trial words=$words")
    }
  }

  /** Serial encode reference: replay the trainer's merges per word. */
  private def refEncode(words: Seq[String],
      merges: Seq[(String, String)]): Seq[List[String]] =
    words.map { w =>
      merges.foldLeft(w.map(_.toString).toList) { case (syms, (s1, s2)) =>
        def m(l: List[String]): List[String] = l match {
          case a :: b :: rest if a == s1 && b == s2 => (a + b) :: m(rest)
          case a :: rest => a :: m(rest)
          case Nil => Nil
        }
        m(syms)
      }
    }

  test("encode == per-word serial merge replay on random corpora") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val docWords = Seq.fill(3)(Seq.fill(6)(
        (1 to (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString))
      val docs = docWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val (mergesDf, types) = BpeTrainer.learnBpe(docs, "doc_id",
        split(col("text"), " "), rounds = 3)
      val merges = mergesDf.collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val got = BpeTrainer.encode(docs, "doc_id",
          split(col("text"), " "), types)
        .select("doc_id", "n_words", "n_subwords", "n_oov", "enc_fp")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
      types.unpersist()
      val want = docWords.zipWithIndex.map { case (ws, i) =>
        val segs = refEncode(ws, merges)
        val stream = segs.flatten.mkString(" ")
        // same-corpus encode: every word type is in the table -> 0 OOV
        (i.toLong, ws.size.toLong, segs.map(_.size.toLong).sum, 0L,
          org.apache.commons.codec.digest.DigestUtils.md5Hex(stream))
      }
      assert(got.toSeq == want, s"trial $trial merges=$merges")
    }
  }

  test("cross-corpus encode: OOV words char-split (Sennrich §3.2), " +
      "in-vocab words keep their trained segmentation") {
    // train on a corpus where (a,b) merges; encode a doc mixing an
    // in-vocab word with two unseen ones
    val train = Seq((1L, "ab ab abc")).toDF("doc_id", "text")
    val (mergesDf, types) = BpeTrainer.learnBpe(train, "doc_id",
      split(col("text"), " "), rounds = 1)
    assert(mergesDf.collect().map(r => (r.getString(1), r.getString(2)))
      .toSeq == Seq(("a", "b")))
    val enc = Seq((7L, "abc zzq x ab")).toDF("doc_id", "text")
    val got = BpeTrainer.encode(enc, "doc_id",
        split(col("text"), " "), types)
      .select("doc_id", "n_words", "n_subwords", "n_oov", "enc_fp")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
    types.unpersist()
    // abc -> [ab, c] (trained); zzq -> [z, z, q], x -> [x] (OOV chars);
    // ab -> [ab] (trained). Stream = "ab c z z q x ab"
    val fp = org.apache.commons.codec.digest.DigestUtils
      .md5Hex("ab c z z q x ab")
    assert(got.toSeq == Seq((7L, 4L, 7L, 2L, fp)))
  }

  test("single-char and empty tokens are handled (no pairs, no crash)") {
    val docs = Seq((1L, "x y  z x")).toDF("doc_id", "text") // "" from double space
    val got = BpeTrainer.learnMerges(docs, "doc_id",
      split(col("text"), " "), rounds = 1).collect()
    assert(got.isEmpty) // no adjacent pairs anywhere -> no merge rows
  }

  // --- batched trainer: sequential equivalence (the exactness claim) ---

  /** Run both trainers and assert identical merge lists AND final type
    * tables; returns the batched trainer's merges/jobs ratio.
    */
  private def assertBatchedEqualsSequential(text: String, rounds: Int,
      maxBatch: Int = 16, label: String = ""): Double = {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val tk = split(col("text"), " ")
    val (seqM, seqT) = BpeTrainer.learnBpe(docs, "doc_id", tk, rounds)
    val (batM, batT) =
      BpeTrainer.learnBpeBatched(docs, "doc_id", tk, rounds, maxBatch)
    val jobs = BpeTrainer.lastBatchedJobs.get()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    def table(df: org.apache.spark.sql.DataFrame) = df
      .select(col("w"), col("freq"),
        concat_ws("", col("syms")).as("sy"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted
    val (sm, bm) = (rows(seqM), rows(batM))
    val (st, bt) = (table(seqT), table(batT))
    seqT.unpersist(); batT.unpersist()
    assert(bm == sm, s"$label: batched merge list deviates from sequential")
    assert(bt == st, s"$label: batched type table deviates from sequential")
    if (jobs == 0) 0.0 else sm.size.toDouble / jobs
  }

  test("batched == sequential on the hand corpus (self-pair run)") {
    assertBatchedEqualsSequential("aaab aaab ab", rounds = 3,
      label = "aaab")
  }

  test("batched must refuse the unsafe second pair (created-pair trap)") {
    // pairs: (a,b)=100 ties (x,a)=100, then (c,d)=99. Sequential merges
    // (a,b) first (tie-break), after which the CREATED pair (x,ab)=100
    // outranks (c,d)=99 — a batch {(a,b),(c,d)} would deviate. The
    // bound rule must close the batch after (a,b): intoMax(a) =
    // pf(x,a) = 100 >= 99.
    val text = (Seq.fill(100)("xab") ++ Seq.fill(99)("cd")).mkString(" ")
    assertBatchedEqualsSequential(text, rounds = 4, label = "trap")
  }

  test("batched == sequential when a created symbol collides with an " +
      "existing one") {
    // symbols 'ab' exist both as merge product of (a,b) and inside
    // words containing literal 'ab' next to 'c': merging (a,b) grows
    // pf(ab, c) mid-batch — the existingConcat guard must close the
    // batch at that accept
    val text = (Seq.fill(50)("a b") ++ Seq.fill(30)("q abc")).mkString(" ")
    assertBatchedEqualsSequential(text, rounds = 4, label = "collide")
  }

  test("batched == sequential on disjoint-heavy corpora AND batches " +
      "multiple merges per job") {
    // four symbol-disjoint high-count pairs: one job should land
    // several merges
    val text = (Seq.fill(40)("ab") ++ Seq.fill(30)("cd") ++
      Seq.fill(20)("ef") ++ Seq.fill(10)("gh")).mkString(" ")
    val ratio = assertBatchedEqualsSequential(text, rounds = 4,
      label = "disjoint")
    assert(ratio > 1.5,
      s"expected >1.5 merges/job on a disjoint corpus, got $ratio")
  }

  test("acceptBatch closes the batch on a WITHIN-batch created-symbol " +
      "collision (two accepts concatenating to the same string)") {
    // ('th','e') and ('t','he') are symbol-disjoint and both create
    // 'the'. After both, a pair like (x,'the') counts contributions
    // from BOTH merges — its true count is the SUM, while the bound
    // tracks only the per-merge MAX. A third candidate between max and
    // sum would deviate from sequential order, so the batch must close
    // AT the second accept (which is itself still exact: everything
    // created before it was distinct).
    val top = Seq(("th", "e", 100L), ("t", "he", 90L), ("x", "y", 85L))
    val intoMax = Map("th" -> 50L, "t" -> 40L)   // max_x pf(x, s1)
    val fromMax = Map("e" -> 45L, "he" -> 35L)   // max_y pf(s2, y)
    val out = BpeTrainer.acceptBatch(top, intoMax, fromMax, Set.empty)
    assert(out == Seq(("th", "e", 100L), ("t", "he", 90L)),
      s"expected the batch to close at the colliding accept, got $out")
    // control: same shape with distinct concats accepts all three
    val top2 = Seq(("th", "e", 100L), ("t", "hx", 90L), ("x", "y", 85L))
    val out2 = BpeTrainer.acceptBatch(top2,
      intoMax ++ Map.empty, fromMax ++ Map("hx" -> 35L), Set.empty)
    assert(out2 == top2, s"control batch should accept all three: $out2")
  }

  test("acceptBatch closes the batch on an existingConcat collision " +
      "but keeps the colliding accept") {
    val top = Seq(("a", "b", 100L), ("c", "d", 40L))
    val out = BpeTrainer.acceptBatch(top, Map.empty, Map.empty,
      existingConcat = Set("ab"))
    assert(out == Seq(("a", "b", 100L)))
  }

  test("batched == sequential on seeded random corpora") {
    // rounds capped at 4: the SEQUENTIAL side composes ~3^r copies of
    // the history into its plan (its own doc caps it at 64 for that
    // reason); the batched side localCheckpoints and has no such limit
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 6) {
      val vocab = Seq.fill(14)(
        (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString)
      val text = vocab.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w))
        .mkString(" ")
      assertBatchedEqualsSequential(text, rounds = 4,
        maxBatch = 4, label = s"trial $trial")
    }
  }
}
