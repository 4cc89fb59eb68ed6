package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich/Haddow/Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 —
  * the tokenizer-training algorithm behind GPT/LLaMA-style BPE
  * vocabularies): count word types once over the corpus, then
  * iteratively (a) count adjacent symbol pairs weighted by word
  * frequency, (b) pick the most frequent pair, (c) merge its
  * occurrences greedily left-to-right. The learned merge list IS the
  * tokenizer artifact.
  *
  * Greedy left-to-right non-overlapping semantics (the part naive
  * relational ports get wrong for runs like "aaa" + pair (a,a)) is
  * expressed exactly: matching start positions form consecutive
  * islands (gaps-and-islands over a WORD-bounded window), and within
  * an island every odd-ranked start merges — byte-for-byte the
  * serial algorithm's choice, engine-independent.
  *
  * Scale shape (100 TB): the ONLY corpus-sized pass is the word-type
  * count (one explode + combinable groupBy). Every merge round runs
  * over the word-TYPE table (vocabulary-sized, frequency-weighted) —
  * pair counts are combinable sums, the top pair is a 1-row broadcast
  * joined back on its equi key, islands/rebuild windows partition by
  * the word (structurally bounded by word length). Rounds compose
  * into one plan (DESIGN.md rule 7 — fixed iteration count); a
  * 50k-merge production run would persist per round like
  * Similarity.kmeans.
  */
object BpeTrainer {

  /** Word-type table: (w, freq, syms = characters). Empty tokens are
    * dropped (they have no symbols; and `sequence(1, 0)` would count
    * DOWN — the Spark gotcha — so the guard is structural, not
    * cosmetic).
    */
  def wordTypes(docs: DataFrame, idCol: String, tokens: Column): DataFrame =
    docs.where(col(idCol).isNotNull)
      .select(explode(tokens).as("w"))
      .where(col("w").isNotNull && col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        // per-char substr is an O(i) UTF-8 seek — fine at word length;
        // this runs over the vocabulary-sized type table, not the corpus
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"))

  /** Adjacent symbol pairs of the current type table:
    * (w, freq, p, s1, s2), p = 1-based pair start. */
  private def pairFrame(cur: DataFrame): DataFrame = {
    val n = size(col("syms"))
    cur.select(col("w"), col("freq"),
        posexplode(zip_with(
          slice(col("syms"), lit(1), greatest(n - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(n - 1, lit(0))),
          (a, b) => struct(a.as("s1"), b.as("s2")))))
      .select(col("w"), col("freq"), (col("pos") + 1).cast("long").as("p"),
        col("col.s1").as("s1"), col("col.s2").as("s2"))
  }

  /** Merge the LITERAL pair (s1, s2) greedily in every word type. */
  private def applyMerge(cur: DataFrame, s1: String, s2: String): DataFrame = {
    val matches = pairFrame(cur)
      .where(col("s1") === s1 && col("s2") === s2)
      .select(col("w"), col("p"))
    // greedy starts: islands of consecutive matches, odd ranks merge
    val wOrd = Window.partitionBy("w").orderBy("p")
    val chosen = matches
      .withColumn("_nf",
        when(col("p") <= lag("p", 1).over(wOrd) + 1, lit(0L)).otherwise(lit(1L)))
      .withColumn("_isl", sum("_nf").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_rn",
        row_number().over(Window.partitionBy("w", "_isl").orderBy("p")))
      .where(col("_rn") % 2 === 1)
      .select(col("w"), col("p"))
    val posTable = cur
      .select(col("w"), col("freq"), posexplode(col("syms")))
      .select(col("w"), col("freq"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("sym"))
    val consumed = chosen.select(col("w"), (col("p") + 1).as("p"))
      .withColumn("_c", lit(1))
    val nextSym = posTable
      .select(col("w"), (col("p") - 1).as("p"), col("sym").as("_next"))
    posTable
      .join(chosen.withColumn("_m", lit(1)), Seq("w", "p"), "left")
      .join(consumed, Seq("w", "p"), "left")
      .where(col("_c").isNull)
      .join(nextSym, Seq("w", "p"), "left")
      .select(col("w"), col("freq"), col("p"),
        when(col("_m") === 1, concat(col("sym"), col("_next")))
          .otherwise(col("sym")).as("sym2"))
      .groupBy("w")
      .agg(min("freq").as("freq"),
        transform(array_sort(collect_list(struct(col("p"), col("sym2")))),
          x => x.getField("sym2")).as("syms"))
  }

  /** The learned merge list after `rounds` iterations:
    * (round, s1, s2, pf) — pf is the frequency-weighted pair count
    * that round. Ends early if no pair remains.
    *
    * Execution model: the merge list is DRIVER state, exactly like a
    * production BPE trainer — each round collects its 1-row top pair
    * (the Clustering convergence-check class of driver action: O(1)
    * rows, never corpus data) and rebuilds the persisted type table
    * with the pair as a literal. This keeps every round's plan linear
    * (the type table has 3 consumers per round; composing rounds
    * lazily would nest lineage ~3^r deep — measured 5.0 s → 3.8 s at
    * sf0.1 for 3 rounds, and the gap widens exponentially with
    * rounds). Per-round persists release their
    * predecessor; the final table is dropped before return.
    */
  def learnMerges(docs: DataFrame, idCol: String, tokens: Column,
      rounds: Int): DataFrame = {
    val (merges, types) = learnBpe(docs, idCol, tokens, rounds)
    types.unpersist()
    merges
  }

  /** [[learnMerges]] plus the trained tokenizer's OTHER artifact: the
    * final word-type table `(w, freq, syms)` — each vocabulary word's
    * segmentation after replaying every learned merge. Encoding a
    * corpus with the trained BPE is then a vocabulary-table equi-join
    * ([[encode]]), not a per-row merge replay. The returned type table
    * stays persisted — the caller unpersists when done.
    */
  def learnBpe(docs: DataFrame, idCol: String, tokens: Column,
      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds $rounds outside [1, 64]: each round is one distributed " +
        "pass + a 1-row collect; beyond toy vocabularies budget " +
        "accordingly")
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = wordTypes(docs, idCol, tokens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cur.count()
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = pairFrame(cur).groupBy("s1", "s2")
        .agg(sum("freq").as("pf"))
        .orderBy(col("pf").desc, col("s1"), col("s2")).limit(1)
        .collect() // 1 row of driver state — the merge table entry
      top.headOption match {
        case None => done = true
        case Some(row) =>
          val (s1, s2, pf) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((r.toLong, s1, s2, pf))
          val next = applyMerge(cur, s1, s2)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          cur.unpersist()
          cur = next
          r += 1
      }
    }
    (merges.toSeq.toDF("round", "s1", "s2", "pf"), cur)
  }

  /** Encode a corpus with a trained segmentation table: per document,
    * the word count, the subword count under the learned merges, the
    * out-of-vocabulary word count, and a fingerprint of the full
    * subword stream in document order (the downstream contract a
    * tokenized-data pipeline hashes and ships).
    *
    * OOV contract (Sennrich §3.2 — the production cross-corpus case):
    * a word absent from the trained type table segments to its
    * CHARACTERS — the zero-merge baseline every BPE implementation
    * falls back to, since character symbols are the alphabet the
    * merges were learned over. Expressed as a LEFT join + coalesce
    * onto the same per-char split [[wordTypes]] seeds with, so an
    * in-vocabulary word is byte-identical to the inner-join form and
    * an encode never silently drops tokens. `n_oov` surfaces the rate
    * (a high rate means the training corpus no longer represents the
    * encode corpus — the drift signal a pipeline alerts on).
    *
    * Scale shape: one token posexplode, ONE equi-join against the
    * vocabulary-sized type table (broadcast below the threshold, hash
    * join above — either way the corpus shuffles at most once on the
    * word key), one doc-bounded aggregation. No per-row merge replay:
    * the segmentation was paid ONCE at training, per word TYPE; the
    * char-split fallback is a per-row expression on the (rare) OOV
    * rows, never a second pass.
    */
  def encode(docs: DataFrame, idCol: String, tokens: Column,
      types: DataFrame): DataFrame = {
    val toks = docs.where(col(idCol).isNotNull)
      .select(col(idCol), posexplode(tokens).as(Seq("pos", "w")))
      .where(col("w").isNotNull && col("w") =!= "")
    val charSplit = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    toks.join(types.select(col("w"), col("syms")), Seq("w"), "left")
      .select(col(idCol), col("pos"),
        col("syms").isNull.as("oov"),
        coalesce(col("syms"), charSplit).as("syms"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(col("syms"))).cast("long").as("n_subwords"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        md5(concat_ws(" ", flatten(
          transform(array_sort(collect_list(struct(col("pos"), col("syms")))),
            x => x.getField("syms"))))).as("enc_fp"))
  }
}
