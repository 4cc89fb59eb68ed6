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

  /** One merge round: returns (rebuilt types, the 1-row chosen pair
    * (s1, s2, pf)). Deterministic tie-break (pf desc, s1, s2).
    */
  private def mergeRound(cur: DataFrame): (DataFrame, DataFrame) = {
    val n = size(col("syms"))
    val pairs = cur
      .select(col("w"), col("freq"),
        posexplode(zip_with(
          slice(col("syms"), lit(1), greatest(n - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(n - 1, lit(0))),
          (a, b) => struct(a.as("s1"), b.as("s2")))))
      .select(col("w"), col("freq"), (col("pos") + 1).cast("long").as("p"),
        col("col.s1").as("s1"), col("col.s2").as("s2"))
    val top = pairs.groupBy("s1", "s2").agg(sum("freq").as("pf"))
      .orderBy(col("pf").desc, col("s1"), col("s2")).limit(1)
    val matches = pairs
      .join(broadcast(top.select("s1", "s2")), Seq("s1", "s2"))
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
    val rebuilt = posTable
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
    (rebuilt, top)
  }

  /** The learned merge list after `rounds` iterations:
    * (round, s1, s2, pf) — pf is the frequency-weighted pair count
    * that round.
    */
  def learnMerges(docs: DataFrame, idCol: String, tokens: Column,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 5,
      s"rounds $rounds outside [1, 5]: merge rounds compose into one " +
        "plan (persist per round beyond that, like Similarity.kmeans)")
    var cur = wordTypes(docs, idCol, tokens)
    val tops = (1 to rounds).map { r =>
      val (next, top) = mergeRound(cur)
      cur = next
      top.withColumn("round", lit(r.toLong))
    }
    tops.reduce(_ union _)
      .select(col("round"), col("s1"), col("s2"), col("pf"))
      .orderBy("round")
  }
}
