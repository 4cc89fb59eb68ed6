package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (the 100 TB story):
  *  - MinHash signatures are computed per row with array HOFs — no explode,
  *    no shuffle; one pass over the tokens per hash-family member, all
  *    inside codegen.
  *  - LSH banding turns near-dup search into an equi-groupBy on band keys —
  *    one hash shuffle, linear in corpus size; no pairwise join ever
  *    touches the full corpus.
  *  - Pair verification (Jaccard) runs only on blocked candidates.
  *  - SimHash uses one explode + one grouped aggregation (single shuffle),
  *    with the per-word hash computed once and reused by all bit planes.
  */
object NearDup {

  // --- MinHash / LSH ---

  /** Probability that a pair with Jaccard similarity `j` shares at
    * least one LSH band: 1 - (1 - j^rows)^bands — the s-curve that
    * governs banding recall/precision.
    */
  def bandHitProbability(j: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, rowsPerBand), bands)

  /** Pick (bands, rowsPerBand) for a signature budget of `numHashes`
    * members and a target similarity threshold: among the exact
    * factorizations b*r = numHashes, choose the one whose s-curve
    * inflection (1/b)^(1/r) sits closest to `threshold` — pairs above
    * the threshold are likely candidates, pairs well below mostly are
    * not. Driver-side arithmetic; feed the result to [[lshBands]].
    */
  def bandingFor(numHashes: Int, threshold: Double): (Int, Int) = {
    require(numHashes >= 1 && threshold > 0.0 && threshold < 1.0,
      "need numHashes >= 1 and threshold in (0,1)")
    val options = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map { b =>
        val r = numHashes / b
        (b, r, math.pow(1.0 / b, 1.0 / r))
      }
    val (b, r, _) = options.minBy { case (_, _, inflection) =>
      math.abs(inflection - threshold)
    }
    (b, r)
  }

  /** K-member minhash signature columns over a PRE-HASHED element column
    * (`hs` = array<long> of h32 values): each member is a linear mix of
    * the shared base hash — one md5 per element total, not one per
    * (element × member).
    */
  def minhashSignature(hs: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(hs, h => Hashing.mix(i, h))).as(s"mh$i")
    }

  /** doc → (band_id, band_key) rows; docs sharing a band key are LSH
    * candidates. numHashes = bands * rowsPerBand. The base-hash array is
    * materialized in its own projection: it is referenced by every
    * signature member, and CollapseProject keeps non-cheap multi-use
    * expressions un-inlined, so md5 runs once per element.
    */
  def lshBands(df: DataFrame, idCol: Column, words: Column,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val hashed = df.select(idCol.as("doc_id"),
      transform(words, w => Hashing.h32(w)).as("hs"))
    val sig = hashed.select(col("doc_id") +:
      minhashSignature(col("hs"), bands * rowsPerBand): _*)
    val bandStructs = (0 until bands).map { b =>
      val key = concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
      struct(lit(b.toLong).as("band_id"), key.as("band_key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
  }

  /** LSH buckets with more than one member — the candidate groups. */
  def lshBuckets(bandsDf: DataFrame): DataFrame =
    bandsDf.groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("bucket_size"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .where(col("bucket_size") > 1)

  /** End-to-end MinHash-LSH near-dup: band → bounded buckets → distinct
    * candidate pairs → exact Jaccard verification over the full element
    * sets. The standard two-phase shape: LSH prunes the search space to
    * same-bucket pairs, the exact verify removes LSH's false positives.
    *
    * Scale design: buckets larger than `maxBucket` are dropped before
    * pairing (a degenerate bucket — boilerplate pages, empty docs —
    * would otherwise go quadratic; standard LSH practice), so the pair
    * join fans out at most maxBucket² per bucket. Candidate pairs are
    * deduped across bands before the verify join, and the verify joins
    * on slim (id → element set) projections.
    */
  /** Distinct LSH candidate pairs (d1 < d2) — banding + bounded buckets
    * WITHOUT the Jaccard verify. Exposed separately so a recall audit
    * can measure candidate generation directly (the verify stage is
    * config-independent, so candidate-set recall equals verified-pair
    * recall for a deterministic verify).
    */
  def lshCandidatePairs(df: DataFrame, idCol: Column, words: Column,
      bands: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    val banded = lshBands(df, idCol, words, bands, rowsPerBand)
    val keep = banded.groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("bucket_size"))
      .where(col("bucket_size").between(2, maxBucket))
      .select("band_id", "band_key")
    val bounded = banded.join(keep, Seq("band_id", "band_key"))
    val a = bounded.select(col("band_id"), col("band_key"),
      col("doc_id").as("d1"))
    val b = bounded.select(col("band_id"), col("band_key"),
      col("doc_id").as("d2"))
    a.join(b, Seq("band_id", "band_key"))
      .where(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  /** Incremental near-dup: verified LSH matches of a NEW batch against
    * a HISTORICAL corpus (the daily-intake sibling of the exact
    * anti-join in q_incremental_dedup — near-verbatim rewrites of
    * already-ingested documents, not just byte-identical ones). Both
    * sides band with the SAME configuration; candidates are the
    * cross-corpus band-key join. The bucket cap applies to the
    * HISTORY side only: a boilerplate bucket in a years-deep corpus
    * would fan every matching batch doc out by its size, while batch
    * buckets are day-sized. No lower bound here (unlike within-corpus
    * pairing, where a singleton bucket cannot form a pair, a singleton
    * HISTORY bucket + one batch doc is exactly a candidate).
    *
    * Output: (new_id, old_id, inter_size, union_size, jac), verified
    * at `minJaccard`.
    */
  def incrementalNearDupPairs(batch: DataFrame, history: DataFrame,
      idCol: Column, words: Column, bands: Int, rowsPerBand: Int,
      maxBucket: Int, minJaccard: Double): DataFrame = {
    require(minJaccard > 0,
      "minJaccard must be > 0: only same-bucket pairs are candidates")
    val bb = lshBands(batch, idCol, words, bands, rowsPerBand)
      .select(col("band_id"), col("band_key"), col("doc_id").as("new_id"))
    val bh0 = lshBands(history, idCol, words, bands, rowsPerBand)
    val keep = bh0.groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("bucket_size"))
      .where(col("bucket_size") <= maxBucket)
      .select("band_id", "band_key")
    val bh = bh0.join(keep, Seq("band_id", "band_key"))
      .select(col("band_id"), col("band_key"), col("doc_id").as("old_id"))
    val cand = bb.join(bh, Seq("band_id", "band_key"))
      .select("new_id", "old_id").distinct()
    val tkN = batch.select(idCol.as("new_id"), words.as("tk1"))
    val tkO = history.select(idCol.as("old_id"), words.as("tk2"))
    val joined = cand.join(tkN, "new_id").join(tkO, "old_id")
    val (inter, union) = setOverlap(col("tk1"), col("tk2"))
    joined
      .withColumn("inter_size", inter)
      .withColumn("union_size", union)
      .withColumn("jac", col("inter_size").cast("double") / col("union_size"))
      .where(col("jac") >= minJaccard)
      .select("new_id", "old_id", "inter_size", "union_size", "jac")
  }

  def lshNearDupPairs(df: DataFrame, idCol: Column, words: Column,
      bands: Int, rowsPerBand: Int, maxBucket: Int,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0,
      "minJaccard must be > 0: only same-bucket pairs are candidates")
    val cand = lshCandidatePairs(df, idCol, words, bands, rowsPerBand,
      maxBucket)
    val tk = df.select(idCol.as("doc_id"), words.as("tk"))
    val joined = cand
      .join(tk.select(col("doc_id").as("d1"), col("tk").as("tk1")), "d1")
      .join(tk.select(col("doc_id").as("d2"), col("tk").as("tk2")), "d2")
    val (inter, union) = setOverlap(col("tk1"), col("tk2"))
    joined
      .withColumn("inter_size", inter)
      .withColumn("union_size", union)
      .withColumn("jac", col("inter_size").cast("double") / col("union_size"))
      .where(col("jac") >= minJaccard)
      .select("d1", "d2", "inter_size", "union_size", "jac")
  }

  // --- SimHash ---

  /** Per-document SimHash over the distinct-token set (unit weights).
    * One explode + one grouped agg; the h32 per word is computed once and
    * shared by all `bits` planes.
    */
  def simhash(df: DataFrame, idCols: Seq[String], text: Column,
      bits: Int = 16): DataFrame = {
    val exploded = df
      .select(idCols.map(col) :+
        explode(array_distinct(split(text, " "))).as("w"): _*)
      .withColumn("h", Hashing.h32(col("w")))
    val planeSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"s$b")
    }
    val agged = exploded.groupBy(idCols.map(col): _*)
      .agg(planeSums.head, planeSums.tail: _*)
    val sig = (0 until bits)
      .map(b => when(col(s"s$b") >= 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    agged.select(idCols.map(col) :+ sig.as("simhash"): _*)
  }

  /** Near-dup pairs over any fixed-width bit-signature column (SimHash,
    * perceptual image hashes, sign signatures): banded Hamming LSH.
    * The signature is cut into `bands` runs of `bandBits` bits; by
    * pigeonhole, two signatures within Hamming distance < `bands` agree
    * on at least one full band, so the band value is an EXACT equi-join
    * candidate key — candidate generation is a hash shuffle, never
    * pairwise over the corpus. Candidates are verified with the exact
    * popcount distance (`bit_count(xor)` — codegen'd, identical in the
    * DuckDB oracle).
    *
    * `maxDist < bands` is required for lossless recall (distance ≥ bands
    * can disagree everywhere); buckets outside [2, maxBucket] generate no
    * candidates (the same degenerate-bucket cap as the MinHash and
    * sign-signature paths — a stuck band value, e.g. all-zero hashes,
    * would otherwise go quadratic).
    */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
      bands: Int, bandBits: Int, maxDist: Int,
      maxBucket: Int = 10000): DataFrame = {
    require(maxDist < bands,
      s"pigeonhole recall needs maxDist < bands (got $maxDist >= $bands)")
    // shiftrightunsigned + mask keeps band keys non-negative even when
    // the full 64-bit signature has its sign bit set
    require(bands * bandBits <= 64, "banded bits must fit a long")
    val mask = (1L << bandBits) - 1
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col(hashCol), b * bandBits)
          .bitwiseAND(lit(mask)).as("key"))
    }
    val banded = hashes
      .select(col(idCol).as("hid"), col(hashCol).as("h"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("hid"), col("h"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val keep = banded.groupBy("band", "key")
      .agg(count(lit(1)).as("n"))
      .where(col("n").between(2, maxBucket))
      .select("band", "key")
    val bounded = banded.join(keep, Seq("band", "key"))
    val a = bounded.select(col("band"), col("key"),
      col("hid").as("d1"), col("h").as("h1"))
    val b = bounded.select(col("band"), col("key"),
      col("hid").as("d2"), col("h").as("h2"))
    a.join(b, Seq("band", "key"))
      .where(col("d1") < col("d2"))
      // one pair can collide in several bands — dedup before verify
      .select("d1", "d2", "h1", "h2").distinct()
      .withColumn("dist",
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .where(col("dist") <= maxDist)
      .select("d1", "d2", "dist")
  }

  // --- n-gram Jaccard ---

  /** Distinct bigram shingles of a token array. */
  def bigramShingles(words: Column): Column = {
    val n = size(words)
    array_distinct(
      zip_with(
        slice(words, lit(1), n - 1),
        slice(words, lit(2), n - 1),
        (x, y) => concat(x, lit(" "), y)))
  }

  /** Exact Jaccard columns over two set-valued columns (distinct
    * elements): returns (intersection size, union size) as longs.
    */
  def setOverlap(a: Column, b: Column): (Column, Column) = {
    val inter = size(array_intersect(a, b)).cast("long")
    val union = (size(a) + size(b)).cast("long") - inter
    (inter, union)
  }

  /** Exact Jaccard over blocked candidate pairs via an INVERTED INDEX:
    * hash each shingle to a 32-bit long, explode, equi-join on
    * (block, shingle-hash), count matches per pair — intersection sizes
    * fall out of a groupBy instead of a quadratic per-pair
    * array_intersect. This is the shape that survives 100 TB:
    *  - the shuffle key is an 8-byte long, not the shingle string itself,
    *    so shuffle bytes are O(shingle count), not O(corpus re-serialized);
    *  - ultra-common shingles ("of the") are dropped by a document-
    *    frequency cutoff (`maxDf`, standard MinHashLSH stop-shingle
    *    practice) before the self-join, capping per-bucket join fan-out at
    *    maxDf² instead of letting one hot key go quadratic in block size;
    *  - pairs with zero overlap never materialize, and per-doc set sizes
    *    come from the same kept index as a cheap re-aggregation.
    *
    * Semantics: Jaccard over the df-filtered, HASHED shingle sets (the
    * oracle hashes and filters identically, so results stay bit-exact
    * cross-engine). Zero-overlap pairs are never emitted, hence
    * minJaccard must be positive.
    *
    * Input: (doc_id, lang, bucket, sh: array<string> of DISTINCT shingles).
    * Output: (d1, d2, inter_size, union_size, jac) for jac >= minJaccard.
    */
  def jaccardPairs(d: DataFrame, minJaccard: Double,
      maxDf: Int = Int.MaxValue): DataFrame = {
    require(minJaccard > 0,
      "minJaccard must be > 0: the inverted index only materializes " +
        "overlapping pairs, so jac = 0 pairs are never emitted")
    // In-row array_distinct + per-element hash, NOT the explode-then-
    // row-distinct shape Contamination uses: a row-distinct would add a
    // full extra shuffle of the exploded index. explode_outer + null
    // filter, NOT explode: callers pass `sh` as a projection ALIAS over
    // the raw text (shingling expression), and InferFiltersFromGenerate's
    // size(hs)>0 constraint substitutes through both aliases — the whole
    // shingle+hash expression lands in a pushed-down filter below the
    // caller's scan/fan-out exchange and re-evaluates single-task (the
    // r10 alias-substitution class; measured +1.2 s on q_ngram_jaccard).
    val hashed = d.select(col("doc_id"), col("lang"), col("bucket"),
      array_distinct(transform(col("sh"), s => Hashing.h32(s))).as("hs"))
    val ex0 = hashed.select(col("doc_id"), col("lang"), col("bucket"),
      explode_outer(col("hs")).as("s"))
      .where(col("s").isNotNull)
    // Stop-shingle cutoff: one windowed count per (block, shingle-hash) —
    // a single hash shuffle, reused by the self-join below.
    val ex =
      if (maxDf == Int.MaxValue) ex0
      else ex0
        .withColumn("df", count(lit(1))
          .over(Window.partitionBy("lang", "bucket", "s")))
        .where(col("df") <= maxDf)
        .drop("df")
    // Per-doc kept-set size rides along WITH the index rows (one windowed
    // count per doc_id) instead of being aggregated separately and joined
    // back on d1/d2: two fewer shuffles, and the index subtree is consumed
    // exactly twice (the two self-join sides — structurally identical, so
    // the exchange is computed once and reused).
    val withSz = ex.withColumn("sz",
      count(lit(1)).over(Window.partitionBy("doc_id")))
    val a = withSz.select(col("doc_id").as("d1"), col("sz").as("sz1"),
      col("lang"), col("bucket"), col("s"))
    val b = withSz.select(col("doc_id").as("d2"), col("sz").as("sz2"),
      col("lang"), col("bucket"), col("s"))
    a.join(b, Seq("lang", "bucket", "s"))
      .where(col("d1") < col("d2"))
      .groupBy("d1", "sz1", "d2", "sz2")
      .agg(count(lit(1)).as("inter_size"))
      .withColumn("union_size", col("sz1") + col("sz2") - col("inter_size"))
      .withColumn("jac", col("inter_size").cast("double") / col("union_size"))
      .where(col("jac") >= minJaccard)
      .select("d1", "d2", "inter_size", "union_size", "jac")
  }

  /** Directed containment pairs over a hashed-shingle inverted index:
    * containment(d1 ⊆ d2) = |grams(d1) ∩ grams(d2)| / |grams(d1)|. The
    * inclusion signal symmetric Jaccard structurally misses: a short
    * document quoted whole inside a long one has containment ≈ 1 but
    * Jaccard ≈ |short|/|long| ≈ 0 — exactly the syndication/boilerplate-
    * wrapping shape a crawl corpus is full of. Output is DIRECTED
    * (d1 = contained, d2 = container; both orientations can appear).
    *
    * Scale shape (DESIGN.md): gram doc-frequency via a COMBINABLE
    * groupBy + AQE-skew-splittable join-back (a boilerplate gram is a
    * hot key; `maxDf` then drops it from the index entirely, bounding
    * the self-join fan-out at df²); per-doc kept-set size via a
    * doc_id-partitioned window (structurally bounded — a doc has at
    * most its own gram count). Only docs with ≥ `minGrams` kept grams
    * participate on EITHER side (a 2-gram doc "contained" in anything
    * is noise, and a tiny container is symmetric noise). Integer
    * milli-containment keeps the verdict bit-identical across engines.
    */
  def containmentPairs(d: DataFrame, minContainMilli: Long = 800L,
      maxDf: Int = Int.MaxValue, minGrams: Long = 1L): DataFrame = {
    require(minContainMilli > 0,
      "minContainMilli must be > 0: the inverted index only materializes " +
        "overlapping pairs, so containment = 0 pairs are never emitted")
    // explode_outer + null filter: same InferFiltersFromGenerate
    // rationale as jaccardPairs above
    val hashed = d.select(col("doc_id"), col("lang"),
      array_distinct(transform(col("sh"), s => Hashing.h32(s))).as("hs"))
    val ex0 = hashed.select(col("doc_id"), col("lang"),
      explode_outer(col("hs")).as("s"))
      .where(col("s").isNotNull)
    val ex =
      if (maxDf == Int.MaxValue) ex0
      else {
        val dfs = ex0.groupBy("lang", "s").agg(count(lit(1)).as("__df"))
        ex0.join(dfs, Seq("lang", "s"))
          .where(col("__df") <= maxDf).drop("__df")
      }
    val withSz = ex
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .where(col("sz") >= minGrams)
    val a = withSz.select(col("doc_id").as("d1"), col("sz").as("sz1"),
      col("lang"), col("s"))
    val b = withSz.select(col("doc_id").as("d2"), col("lang"), col("s"))
    a.join(b, Seq("lang", "s"))
      .where(col("d1") =!= col("d2"))
      .groupBy("d1", "sz1", "d2")
      .agg(count(lit(1)).as("inter_size"))
      .withColumn("contain_milli", expr("(inter_size * 1000) div sz1"))
      .where(col("contain_milli") >= minContainMilli)
      .select("d1", "d2", "inter_size", "sz1", "contain_milli")
  }

  /** Position capacity for the winnowing (hash, pos) encoding: grams per
    * document must stay below 2^20 (~1M). A 100 TB corpus can exceed
    * that on pathological megadocuments — callers gate on document
    * length first (the Gopher max-token rule already does).
    */
  private val WinnowPosBits = 20

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD '03 — the
    * MOSS algorithm): hash every ORDERED k-gram, slide a window of `w`
    * consecutive hashes, keep each window's minimum; distinct kept
    * hashes are the document's fingerprints. Guarantees: any shared
    * substring of ≥ w + k - 1 tokens contributes at least one SHARED
    * fingerprint, while only ~2/(w+1) of all grams are kept — robust
    * partial-overlap detection at a fraction of the index size, the
    * right tool when containment/Jaccard over full gram sets is too
    * expensive.
    *
    * Takes the raw token column and STAGES it as its own projection
    * before building ordered k-grams (duplicates kept — positions are
    * the algorithm): `ngrams` references its input k + 1 times, and a
    * non-attribute array expression would be re-inlined into every
    * `element_at`, re-splitting the text per gram element — O(len²)
    * per document (measured 10.7 s → 0.9 s at sf0.1 for the explode
    * stage alone). The window min is taken over h·2^20 + pos, i.e.
    * ties break to the earliest position, deterministically. Both
    * window functions partition by doc_id — structurally bounded
    * groups (DESIGN.md rule 1.2) sharing ONE exchange. Docs with fewer
    * than w full windows yield no fingerprints (the classic
    * full-window definition).
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, words: Column,
      k: Int, w: Int): DataFrame = {
    require(w >= 1, "winnow window must be >= 1")
    val B = 1L << WinnowPosBits
    // hash AFTER the explode, in a plain Project (codegen'd once) — the
    // Contamination shape lesson; a transform-lambda h32 runs
    // interpreted and re-evaluates around the Generate.
    // isnotnull(id) is explicit, not inference-dependent: winnowPairs
    // consumes this subtree THREE ways (df counts + both self-join
    // sides), and only the join sides infer the constraint — divergent
    // twins lose AQE exchange reuse and re-run the explode + window
    // per branch (the round-8 Contamination lesson; found by the
    // fleet-wide ReuseAudit).
    val g = docs.where(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), words.as("_tk"))
      .select(col("doc_id"), Contamination.ngrams(col("_tk"), k).as("sh"))
      .select(col("doc_id"), posexplode(col("sh")).as(Seq("pos", "gstr")))
      .select(col("doc_id"), col("pos"), Hashing.h32(col("gstr")).as("h"))
    val perDoc = Window.partitionBy("doc_id")
    val sliding = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    g.withColumn("n", count(lit(1)).over(perDoc))
      // fail LOUDLY on a megadocument that would overflow the position
      // bits: pos >= 2^20 would bleed into the hash and silently
      // fabricate fingerprints. assert_true is null on success, so the
      // coalesce keeps the filter a pass-through.
      .where(coalesce(assert_true(col("n") <= lit(B),
        lit(s"winnowFingerprints: document exceeds $B grams — " +
          "gate document length first")), lit(true)))
      .withColumn("we", min(col("h") * B + col("pos")).over(sliding))
      .where(col("pos") <= col("n") - w) // full windows only (pos 0-based)
      .select(col("doc_id"), expr(s"we div $B").as("fp"))
      .distinct()
  }

  /** Candidate pairs sharing ≥ `minShared` winnowing fingerprints.
    * Fingerprint doc-frequency cutoff (combinable groupBy + join-back)
    * drops boilerplate fingerprints before the self-join, bounding
    * fan-out at df² exactly as in [[containmentPairs]].
    */
  def winnowPairs(docs: DataFrame, idCol: String, words: Column, k: Int,
      w: Int, maxDf: Int = Int.MaxValue,
      minShared: Long = 1L): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, words, k, w)
    val kept =
      if (maxDf == Int.MaxValue) fps
      else {
        val dfs = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
        fps.join(dfs, Seq("fp")).where(col("__df") <= maxDf).drop("__df")
      }
    val a = kept.select(col("doc_id").as("d1"), col("fp"))
    val b = kept.select(col("doc_id").as("d2"), col("fp"))
    a.join(b, Seq("fp"))
      .where(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select("d1", "d2", "n_shared")
  }
}
