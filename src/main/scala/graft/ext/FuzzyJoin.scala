package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — character-level fuzzy record
  * linkage ("Customer#000000123" vs "Customer#000000128"), the
  * complement of NearDup's token-level n-gram Jaccard. Used for entity
  * resolution over titles/names/URLs where the variation is typos and
  * digit drift, not word choice.
  *
  * The naive join is O(n²) levenshtein evaluations — structurally
  * impossible at corpus scale. This implements LOSSLESS Ed-Join
  * blocking (Xiao, Wang & Lin, VLDB 2008; prefix principle from
  * SSJoin — Chaudhuri, Ganti & Kaushik, ICDE 2006) over POSITIONAL
  * q-grams, with both of the paper's prefix-side filters:
  *
  *  - every string exposes its q-gram OCCURRENCES (value, 1-based
  *    start); one edit overlaps ≤ q occurrence intervals, so d edits
  *    destroy ≤ q·d occurrences, and every surviving occurrence maps
  *    to an equal-valued occurrence of the partner within d positions
  *    (indels shift later grams by ≤ d, never past it);
  *  - occurrences are ordered globally by (corpus value frequency,
  *    value, position) and each string keeps a PREFIX of its smallest;
  *  - LOCATION-BASED SHRINKING: the prefix is cut at the shortest
  *    head whose occurrences CANNOT all be destroyed by d edits
  *    (minimum stabbing points of the intervals [pos, pos+q−1] > d) —
  *    never longer than the classic q·d+1, usually shorter (two
  *    non-overlapping rare grams already need 2 edits at d=1);
  *  - candidates must share a prefix gram BY VALUE AND POSITION
  *    (|Δpos| ≤ d) — the positional constraint value-only blocking
  *    discards. (Ed-Join's third filter, q-gram COUNTING, was
  *    implemented, proven lossless, priced, and measured OUT: see
  *    [[countFilterCond]].) Measured on sf0.1 customer (15k uniform-format names,
  *    109-gram alphabet): value-only blocking yields 8.5M candidate
  *    pairs, positional 6.0M for 262.5k true pairs. The honest scale
  *    statement (probed by tools/FuzzyScaleProbe, two decades in
  *    SCALING.md): on a BOUNDED-alphabet uniform-format corpus the
  *    signature space saturates and candidates grow ~n²·c with
  *    c ≈ (avg prefix size)²/|gram×posBucket space| — an inherent
  *    floor of ANY lossless signature scheme when strings genuinely
  *    pack tighter than the signature space; natural-text corpora
  *    (large alphabets, varying formats) keep c's denominator growing
  *    with the corpus, and the engine's job is to make the floor
  *    parallel, which the shuffle-hash shape below does.
  *
  * Losslessness (so the q_fuzzy_pairs hash match vs DuckDB's
  * brute-force ground truth proves recall 1.0, not estimates it):
  * suppose ed(s,t) ≤ d and NO preserved occurrence pair lands in both
  * prefixes. Some preserved a* sits in s's prefix (a shrunk prefix
  * cannot be wholly destroyed, by construction), so its partner φ(a*)
  * must rank above ALL of t's prefix; symmetrically t's prefix holds a
  * preserved b* = φ(a') with a' above all of s's prefix. If the two
  * gram values differ, the global order gives a*(<)a' and
  * φ(a')(<)φ(a*) — but φ preserves (freq, value), contradiction. If
  * the values are equal, the order falls to position, and an optimal
  * alignment is position-monotone — same contradiction. So one shared
  * (value, ±d-position) pair always survives in the joined prefixes.
  *
  * Scale shape: the gram-frequency table is bounded by charset^q rows
  * (≤ ~10k for q=2 over ASCII) — broadcast by construction, never a
  * shuffle of the corpus. The prefix rank is a per-string window
  * (groups ≤ string length). The candidate join is a pure EQUI-join on
  * (gram, ⌊pos/(d+1)⌋): the position bucket folds the ±d tolerance
  * into the key (one side explodes to its 3 neighbor buckets), so the
  * join shuffle-partitions on a high-cardinality composite at cluster
  * scale instead of nested-looping or hot-keying on bare gram values,
  * and AQE skew-split applies if one (gram, bucket) block is dense.
  * The probe side is explicitly repartitioned so the expanding join
  * and the in-join levenshtein verification spread across all cores —
  * blocks that stay dense after the positional filter are
  * output-bound (candidates ≈ answers, the floor any complete
  * algorithm pays).
  */
object FuzzyJoin {

  /** All (id1 < id2) pairs of `df` rows whose `strCol` values are
    * within levenshtein distance `d`, found via positional prefix
    * blocking and verified exactly. Output: (id1, id2, str1, str2,
    * dist).
    *
    * The filter's guarantee needs a surviving gram OCCURRENCE: a
    * string with len − q + 1 ≤ q·d occurrences can lose ALL of them to
    * d edits and share no gram with a true match ("ab"→"ax" at q=2,
    * d=1 shares nothing). So strings of length ≤ q(d+1)−1 bypass the
    * filter through an exact short-string path: their partners all
    * have length ≤ q(d+1)−1+d, a length-bounded population that
    * equi-joins on an exploded length key (hash join, never a nested
    * loop; at corpus scale names/URLs/titles live far above this
    * cutoff — the short set is census noise; FuzzyJoinSpec still
    * proves the routing).
    */
  /** Normalized (id, s, len) projection of a caller frame. */
  private def normalize(df: DataFrame, idCol: String,
      strCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))

  /** Positional q-gram occurrences (value, 1-based start) of every
    * string longer than the short-path cutoff.
    */
  private def gramOccurrences(rows: DataFrame, d: Int,
      q: Int): DataFrame = {
    val shortCut = q * (d + 1) - 1
    rows.where(col("len") > shortCut)
      .select(col("id"), col("s"), col("len"),
        posexplode(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> substring(s, i, $q))")))
      .select(col("id"), col("s"), col("len"),
        (col("pos") + 1).as("pos"), col("col").as("gram"))
  }

  /** The location-shrunk positional prefix of every string, under the
    * (freq, gram, pos) total order given by `freq` — which MUST be a
    * pure function of the gram value, shared by every side of a join
    * (the losslessness proof needs one global order). Grams absent
    * from `freq` rank rarest (freq 0) — the R-S case where a probe
    * string carries a gram the corpus never saw.
    *
    * Prefix selection: rank occurrences by the global order, keep the
    * classic q·d+1 head, then cut at the shortest head that needs
    * > d edits to destroy (Ed-Join §4 location shrinking: minimum
    * stabbing points of the intervals [pos, pos+q−1], greedy over
    * positions sorted ascending; arrays ≤ q·d+1 entries, and the
    * shrink window shares the rank window's partitioning — no extra
    * shuffle). Position ties break by position: the proof leans on
    * the alignment's position monotonicity within equal gram values.
    */
  private def shrunkPrefix(grams: DataFrame, freq: DataFrame, d: Int,
      q: Int): DataFrame = {
    val prefixLen = q * d + 1
    val w = Window.partitionBy("id")
      .orderBy(col("freq"), col("gram"), col("pos"))
    val ranked = grams.join(broadcast(freq), Seq("gram"), "left")
      .withColumn("freq", coalesce(col("freq"), lit(0L)))
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= prefixLen)
    def minEdits(posArr: String): String =
      s"aggregate(array_sort($posArr), " +
        "named_struct('c', 0, 'cov', -2147483647), " +
        s"(st, p) -> if(p > st.cov, " +
        s"named_struct('c', st.c + 1, 'cov', p + ${q - 1}), st)).c"
    val posOfFirstK: String => String = k =>
      s"transform(filter(_parr, x -> x._rk <= $k), x -> x.pos)"
    val kStar =
      s"array_min(filter(transform(sequence(${d + 1}, $prefixLen), " +
        s"k -> if(${minEdits(posOfFirstK("k"))} > $d, k, " +
        "cast(null as int))), v -> v is not null))"
    ranked
      .withColumn("_parr",
        collect_list(struct(col("_rk"), col("pos")))
          .over(Window.partitionBy("id")))
      .withColumn("_k", coalesce(expr(kStar), lit(prefixLen)))
      .where(col("_rk") <= col("_k"))
      .select(col("gram"), col("pos"), col("id"), col("s"), col("len"))
  }

  /** Count filter (the q-gram counting bound of Gravano et al., VLDB
    * 2001, applied in Ed-Join as the d ≥ 2 refinement): strings within
    * edit distance d share at least max(|s|,|t|) − q + 1 − q·d
    * positional q-grams (value-equal within ±d positions) — each edit
    * destroys at most q gram occurrences and shifts survivors ≤ d. The
    * expression counts, for each gram position of s, whether ANY
    * ±d-window position of s2 carries the same gram; that per-position
    * existence count upper-bounds the true 1-1 matching size, so
    * requiring it to reach the bound is LOSSLESS. Vacuous (bound ≤ 0)
    * for short strings — the OR short-circuits before the scan runs,
    * which also keeps the inner sequence() ranges valid (bound > 0
    * plus the candidate length filter |len−len2| ≤ d imply both
    * strings carry grams and the j-window is non-empty).
    *
    * MEASURED OUT of the execution path (kept for the probes and the
    * record): Ed-Join's count-filter trade assumes precomputed gram
    * sets and an expensive unbanded verify. In this dataflow the grams
    * would be recomputed per candidate through interpreted
    * higher-order functions while the verify is a CODEGEN'D BANDED
    * levenshtein — on the same 74.1M cached d=2 adversarial
    * candidates the filter costs 59.8 s and kills zero (repeated
    * digit-grams saturate the per-position existence count exactly
    * where candidates are dense), the banded verify costs 6.4 s and
    * resolves everything (FuzzyScaleProbe adv-d2). On natural name
    * corpora it does prune (402→190 of 24 true, names-d2) but the
    * verify there is already sub-second. A guard that costs 9× the
    * thing it guards is not a filter; the probes keep the evidence.
    * `private[graft]` so FuzzyScaleProbe can price exactly this
    * predicate on the adversarial corpora.
    */
  private[graft] def countFilterCond(d: Int, q: Int)
      : org.apache.spark.sql.Column = {
    val bound = s"(greatest(length(s), length(s2)) - ${q - 1} - ${q * d})"
    val cnt =
      s"size(filter(sequence(1, length(s) - ${q - 1}), i -> " +
        s"exists(sequence(greatest(1, i - $d), " +
        s"least(length(s2) - ${q - 1}, i + $d)), j -> " +
        s"substring(s, i, $q) = substring(s2, j, $q))))"
    expr(s"$bound <= 0 OR $cnt >= $bound")
  }

  /** Exact verification of a (id, id2, s, s2) candidate frame:
    * distinct, then the THRESHOLDED levenshtein — the 3-arg form
    * computes only the 2d+1-wide DP band and aborts to −1 past the
    * threshold, O(d·len) per pair instead of the full O(len²) table,
    * with identical distances for every survivor. No intermediate
    * filter sits in front of it: the banded DP IS the cheapest exact
    * predicate available per pair (see [[countFilterCond]]'s header
    * for the measurement that removed the q-gram count filter).
    */
  private def verifyPairs(cands: DataFrame, d: Int, q: Int): DataFrame = {
    cands.distinct()
      .withColumn("dist", levenshtein(col("s"), col("s2"), d))
      .where(col("dist") >= 0)
      .select(col("id").as("id1"), col("id2"),
        col("s").as("str1"), col("s2").as("str2"),
        col("dist").cast("long").as("dist"))
  }

  def selfPairs(df: DataFrame, idCol: String, strCol: String,
      d: Int, q: Int = 2): DataFrame = {
    require(d >= 1 && q >= 1, "d and q must be >= 1")
    val parallelism = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val rows = normalize(df, idCol, strCol)
    // below this, d edits can destroy every gram occurrence
    val shortCut = q * (d + 1) - 1

    val grams = gramOccurrences(rows, d, q)
    // corpus gram frequencies: ≤ charset^q rows — broadcast always
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("freq"))
    val prefix = shrunkPrefix(grams, freq, d, q)

    // candidates: an EQUI-join on (gram, position bucket). Bucket
    // width d+1 makes |Δpos| ≤ d imply a bucket distance ≤ 1, so one
    // side explodes to its 3 neighbor buckets and the tolerance rides
    // the hash key. The join is pinned as a SHUFFLE HASH join with the
    // probe side explicitly key-repartitioned at the session's shuffle
    // width: the verification levenshtein rides the join condition
    // (never materializing the candidate set), so the join's probe
    // loop IS the query's CPU, and it must not collapse to one task —
    // a broadcast join here lets AQE size-coalesce the streamed side
    // to a single partition (measured: 66 s wall ≈ cpu, 1 effective
    // core), while REPARTITION_BY_NUM is the one partitioning AQE
    // never coalesces. At cluster scale the same shape holds: both
    // sides hash-partition on a high-cardinality composite key, no
    // O(corpus) broadcast, and dense (gram, bucket) blocks are
    // output-bound (candidates ≈ answers).
    val bw = d + 1
    val a = prefix
      .withColumn("bk",
        explode(expr(s"sequence(pos div $bw - 1, pos div $bw + 1)")))
      .repartition(parallelism, col("gram"), col("bk"))
    val b = prefix.select(col("gram"), expr(s"pos div $bw").as("bk"),
      col("pos").as("pos2"), col("id").as("id2"),
      col("s").as("s2"), col("len").as("len2"))
    val gramPairs = a.join(b.hint("shuffle_hash"), Seq("gram", "bk"))
      .where(col("id") < col("id2") &&
        abs(col("pos") - col("pos2")) <= d &&
        abs(col("len") - col("len2")) <= d)
      .select(col("id"), col("id2"), col("s"), col("s2"))

    // short-string path: len ≤ q(d+1)−1 strings can evade the gram
    // filter entirely; their partners all live within the length band
    // — a bounded population, exploded across its ±d length
    // neighborhood so the pairing is a plain hash equi-join on len
    val shortish = rows.where(col("len") <= shortCut + d)
    val shorty = rows.where(col("len") <= shortCut)
    val shortishX = shortish.select(
      explode(expr(s"sequence(greatest(len - $d, 0), len + $d)"))
        .as("lenk"),
      col("id").as("ib"), col("s").as("sb"))
    val lt = col("ia") < col("ib")
    val shortPairs = shorty
      .select(col("id").as("ia"), col("s").as("sa"), col("len"))
      .join(broadcast(shortishX),
        col("len") === col("lenk") && col("ia") =!= col("ib"))
      .select(
        when(lt, col("ia")).otherwise(col("ib")).as("id"),
        when(lt, col("ib")).otherwise(col("ia")).as("id2"),
        when(lt, col("sa")).otherwise(col("sb")).as("s"),
        when(lt, col("sb")).otherwise(col("sa")).as("s2"))

    verifyPairs(gramPairs.union(shortPairs), d, q)
  }

  /** Asymmetric (R-S) fuzzy LOOKUP: every (probe, corpus) pair within
    * levenshtein distance `d` — fuzzy entity resolution ("which corpus
    * records is this title/name/id a typo of?") and fuzzy
    * decontamination (benchmark titles vs corpus titles). Output:
    * (id1 = probe id, id2 = corpus id, str1, str2, dist); a probe may
    * match many records and vice versa.
    *
    * Same lossless positional machinery as [[selfPairs]] with ONE
    * global order shared by both sides: gram frequencies come from the
    * CORPUS (a pure value function — that is all the proof needs), and
    * probe grams the corpus never saw rank rarest (freq 0 — they
    * cannot match anything, so they only ever shrink the probe's
    * candidate fan-out). The short-string escape is two-sided: a short
    * PROBE pairs with the corpus length band, and a short CORPUS
    * string pairs with the probe length band — both bounded
    * populations riding broadcast hash equi-joins on exploded length
    * keys.
    *
    * Scale shape: corpus-side prefixes are O(corpus) rows keyed by
    * (gram, posBucket) — the same shuffle-hash join as selfPairs, no
    * O(corpus) broadcast; a small probe set prunes the join to the
    * blocks its grams name.
    */
  def lookupPairs(probes: DataFrame, corpus: DataFrame,
      probeIdCol: String, probeStrCol: String,
      corpusIdCol: String, corpusStrCol: String,
      d: Int, q: Int = 2): DataFrame = {
    require(d >= 1 && q >= 1, "d and q must be >= 1")
    val parallelism = probes.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val pr = normalize(probes, probeIdCol, probeStrCol)
    val cr = normalize(corpus, corpusIdCol, corpusStrCol)
    val shortCut = q * (d + 1) - 1

    val corpusGrams = gramOccurrences(cr, d, q)
    val freq = corpusGrams.groupBy("gram").agg(count(lit(1)).as("freq"))
    val probePrefix = shrunkPrefix(gramOccurrences(pr, d, q), freq, d, q)
    val corpusPrefix = shrunkPrefix(corpusGrams, freq, d, q)

    val bw = d + 1
    val a = probePrefix
      .withColumn("bk",
        explode(expr(s"sequence(pos div $bw - 1, pos div $bw + 1)")))
      .repartition(parallelism, col("gram"), col("bk"))
    val b = corpusPrefix.select(col("gram"),
      expr(s"pos div $bw").as("bk"), col("pos").as("pos2"),
      col("id").as("id2"), col("s").as("s2"), col("len").as("len2"))
    val gramPairs = a.join(b.hint("shuffle_hash"), Seq("gram", "bk"))
      .where(abs(col("pos") - col("pos2")) <= d &&
        abs(col("len") - col("len2")) <= d)
      .select(col("id"), col("id2"), col("s"), col("s2"))

    // two-sided short-string escape (either side below the gram floor)
    def shortSide(short: DataFrame, band: DataFrame): DataFrame = {
      val bandX = band.select(
        explode(expr(s"sequence(greatest(len - $d, 0), len + $d)"))
          .as("lenk"),
        col("id").as("idb"), col("s").as("sb"))
      short.select(col("id").as("ida"), col("s").as("sa"), col("len"))
        .join(broadcast(bandX), col("len") === col("lenk"))
        .select(col("ida"), col("idb"), col("sa"), col("sb"))
    }
    val shortProbe = shortSide(
      pr.where(col("len") <= shortCut),
      cr.where(col("len") <= shortCut + d))
      .select(col("ida").as("id"), col("idb").as("id2"),
        col("sa").as("s"), col("sb").as("s2"))
    val shortCorpus = shortSide(
      cr.where(col("len") <= shortCut),
      pr.where(col("len") <= shortCut + d))
      .select(col("idb").as("id"), col("ida").as("id2"),
        col("sb").as("s"), col("sa").as("s2"))

    verifyPairs(gramPairs.union(shortProbe).union(shortCorpus), d, q)
  }
}
