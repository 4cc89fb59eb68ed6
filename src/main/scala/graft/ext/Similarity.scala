package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * All arithmetic is exact: embeddings are quantized to integer
  * milli-units (`round(x*1000)` — int8/int16-quantization analog), so dot
  * products and norms are bigint sums and the final cosine is a double
  * derived from exact ints — bit-identical across engines AND across
  * partitionings (float summation order never matters).
  *
  * Scale design:
  *  - Brute force = crossJoin with a BROADCAST query set: each executor
  *    scans its slice of the corpus once per query batch; per-vector
  *    norms are precomputed (never recomputed per pair).
  *  - IVF = assign every vector to its nearest centroid (broadcast
  *    centroids), then probe only the query's cell: the pair space drops
  *    from N×Q to (N/C)×Q. Cells are just a partition key — at 100 TB the
  *    assignment is a bucketed write and probes prune to one bucket.
  */
object Similarity {

  /** Quantize a float-array embedding to exact integer milli-units. */
  def quantize(emb: Column, scale: Int = 1000): Column =
    transform(emb, x => round(x.cast("double") * scale).cast("long"))

  /** Exact squared L2 norm of a quantized vector. Native fused
    * expression when a session is active (graft.functions.QNorm2 — one
    * static call inside whole-stage codegen; the HOF form runs an
    * interpreted per-element lambda plus an intermediate array per
    * evaluation and was the ANN battery's dominant CPU sink); the
    * composed-HOF fallback keeps bare Column construction working in
    * tests. Identical values and null semantics either way — see the
    * QVec scaladoc.
    */
  def norm2(q: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.GraftFunctions.register(s)
        call_function(graft.functions.GraftFunctions.QNorm2Name, q)
      case None =>
        aggregate(transform(q, x => x * x), lit(0L), (acc, x) => acc + x)
    }

  /** Exact integer dot product of two quantized vectors (native fused
    * form — see [[norm2]]). */
  def dotq(a: Column, b: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.GraftFunctions.register(s)
        call_function(graft.functions.GraftFunctions.QDotName, a, b)
      case None =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    }

  /** Cosine from exact parts. n2a*n2b ≤ ~4e15 at 64 dims — inside both
    * long and double-exact range.
    */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt((n2a * n2b).cast("double"))

  /** Vectors + precomputed quantized form and norm. */
  def prepared(emb: DataFrame, idCol: String, embCol: String): DataFrame = {
    val q = quantize(col(embCol))
    emb.select(col(idCol), q.as("qv")).withColumn("n2", norm2(col("qv")))
  }

  /** Deterministic CLUSTERED embedding fixture, already in prepared
    * form (vec_id, qv, n2): n vectors over 16 dims with 8 PLANTED
    * orthogonal centroids — vector i belongs to cell i%8 (its two
    * planted coordinates, positions i%8 and i%8+8, carry 1000 milli)
    * plus closed-form integer noise ((i*37 + pos*101) % 201 − 100 ∈
    * [−100, 100] milli on every coordinate). Geometry this induces:
    * cell-mates sit at cosine ≈ 0.95 (production near-duplicate
    * territory) while cross-cell pairs stay ≤ ~0.25 — so the semantic
    * operators run at PRODUCTION thresholds (minCos ≥ 0.8) with the
    * threshold actually firing, unlike the near-orthogonal synthetic
    * `embeddings` table (max within-cell cosine ~0.49) that forces
    * fixture-bent thresholds. Every value is a closed-form function of
    * (vec_id, pos), so the DuckDB oracle rebuilds the identical
    * vectors in SQL.
    */
  def clusteredFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): DataFrame =
    // slice count sized to the DATA (>= 64 vectors per task, capped at
    // the session's cores), not spark.range's default of one slice per
    // core: a 512-vector fixture over 32 cores otherwise plans 32-task
    // stages of 16 rows each all the way down the ANN battery, paying
    // ~32x task-scheduling overhead per stage for no parallelism gain
    spark.range(0, n, 1,
        math.max(1, math.min(spark.sparkContext.defaultParallelism,
          (n + 63) / 64)))
      .select(col("id").as("vec_id"),
      transform(sequence(lit(0L), lit(15L)), pos =>
        when(pos % 8 === col("id") % 8, lit(1000L)).otherwise(lit(0L)) +
          pmod(col("id") * 37 + pos * 101, lit(201)) - 100).as("qv"))
      .withColumn("n2", norm2(col("qv")))

  /** The 8 noise-free planted centroids of [[clusteredFixture]], in
    * prepared form — vec_id is the cell label.
    */
  def clusteredCentroids(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    // 8 rows: one slice, not one per core (see clusteredFixture)
    spark.range(0, 8, 1, 1).select(col("id").as("vec_id"),
      transform(sequence(lit(0L), lit(15L)), pos =>
        when(pos % 8 === col("id"), lit(1000L)).otherwise(lit(0L))).as("qv"))
      .withColumn("n2", norm2(col("qv")))

  /** Brute-force top-k cosine neighbors for a (small, broadcast) query
    * set against the full corpus.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cand = corpus.select(col("vec_id").as("n_id"), col("qv").as("nv"),
      col("n2").as("nn2"))
    val qs = queries.select(col("vec_id").as("q_id"), col("qv").as("quv"),
      col("n2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    cand.crossJoin(broadcast(qs))
      .where(col("n_id") =!= col("q_id"))
      .withColumn("cos",
        cosine(dotq(col("quv"), col("nv")), col("qn2"), col("nn2")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
  }

  /** IVF cell assignment: nearest centroid by cosine (centroids
    * broadcast); ties broken by centroid id.
    *
    * The argmax is a PER-ROW expression over the centroid set collected
    * into ONE broadcast array row: each corpus vector scores every
    * centroid in place and keeps the best — the corpus never leaves its
    * partitions. The previous form expanded corpus×centroids and ran a
    * `groupBy(vec_id)` argmax aggregation, which shuffled every vector's
    * full `qv`/`n2` payload just to compute a value derivable per row;
    * at 100 TB that exchange carries every embedding byte in the corpus
    * (and it cost 2.6-4.5× on the bench). Zero shuffles now: the only
    * join is a 1-row broadcast nested loop.
    *
    * `collect_list` order is nondeterministic, but `array_max` is
    * order-independent and ties break to the smallest centroid id via
    * the negated-id struct field, so the result is deterministic and
    * partitioning-independent. An empty centroid set yields an empty
    * result (null cells are filtered), matching the old crossJoin form.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids
      .select(col("vec_id").as("c_id"), col("qv").as("cv"),
        col("n2").as("cn2"))
      .agg(collect_list(struct(col("c_id"), col("cv"), col("cn2")))
        .as("cents"))
    corpus.crossJoin(broadcast(cents))
      // empty-centroid guard on the CHEAP broadcast array, not on the
      // argmax result: a `best IS NOT NULL` filter would push down with
      // the whole scoring expression inlined and re-evaluate it per row
      // (filter pushdown substitutes aliases — same class as the
      // InferFiltersFromConstraints copies documented in NOTES r10)
      .where(size(col("cents")) > 0)
      .withColumn("best", array_max(transform(col("cents"), c =>
        struct(
          cosine(dotq(col("qv"), c.getField("cv")), col("n2"),
            c.getField("cn2")).as("ccos"),
          (-c.getField("c_id")).as("nid")))))
      .select(col("vec_id"), col("qv"), col("n2"),
        (-col("best").getField("nid")).as("cell"))
  }

  /** Materialize an [[ivfAssign]]-ed corpus CELL-PARTITIONED at rest —
    * the 100 TB layout the header scaladoc promises, now demonstrated
    * rather than asserted (IvfAtRestSpec): each cell becomes a partition
    * directory, so a probe restricted to its query's cell prunes the
    * FILE LISTING to ~corpus/C bytes. Two pruning paths, both
    * spec-pinned:
    *  - a static `cell = k` predicate lands in the scan's
    *    PartitionFilters (classic partition pruning);
    *  - [[ivfTopK]]'s equi-join on the partition column against the
    *    broadcast query set triggers dynamic partition pruning — Spark
    *    builds a `dynamicpruningexpression` from the broadcast probe
    *    cells, so even the JOIN form never lists non-probed cells.
    */
  def writeAssignedPartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Read an at-rest assigned corpus back. The partition-column type is
    * re-cast to long: partition value inference would otherwise narrow
    * small cell ids to int and silently change join/compare semantics
    * against in-memory assignment frames.
    */
  def readAssigned(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path).withColumn("cell", col("cell").cast("long"))

  /** IVF probe: top-k within the query's own cell (1-probe). */
  def ivfTopK(assigned: DataFrame, queryIds: Column, k: Int): DataFrame = {
    val qs = assigned.where(queryIds)
      .select(col("vec_id").as("q_id"), col("qv").as("quv"),
        col("n2").as("qn2"), col("cell").as("q_cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    assigned
      .select(col("vec_id").as("n_id"), col("qv").as("nv"),
        col("n2").as("nn2"), col("cell"))
      .join(broadcast(qs), col("cell") === col("q_cell"))
      .where(col("n_id") =!= col("q_id"))
      .withColumn("cos",
        cosine(dotq(col("quv"), col("nv")), col("qn2"), col("nn2")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
  }

  /** Recall@k scorecard: how much of the EXACT neighbor list an
    * approximate index recovered, per query. The quality gauge every
    * ANN deployment needs before trusting its parameters (nprobe,
    * bands, cell count) at corpus scale — run it on a bounded query
    * SAMPLE (both inputs are per-query top-k lists, so the frame is
    * O(|queries|·k), never corpus-sized; the join is an equi-join on
    * (q_id, n_id)). Integer milli-recall keeps the score bit-identical
    * across engines.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select(col("q_id"), col("n_id"))
      .join(approx.select(col("q_id"), col("n_id"))
          .withColumn("__hit", lit(1L)),
        Seq("q_id", "n_id"), "left")
    hits.groupBy("q_id")
      .agg(count(lit(1L)).as("n_true"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .select(col("q_id"), col("n_true"), col("n_hit"),
        expr("(n_hit * 1000) div n_true").as("recall_milli"))
  }

  /** Deterministic Lloyd iterations to train IVF centroids: assign every
    * vector to its nearest centroid by cosine ([[ivfAssign]] — broadcast
    * centroids, never pairwise over the corpus), recompute each centroid
    * as the elementwise integer mean of its members' quantized vectors
    * (SQL `div` — truncation toward zero, so a dimension whose sum is
    * negative rounds toward 0 rather than down; exact and
    * partitioning-independent either way), repeat. A cell that loses all
    * members drops out (its id simply stops appearing).
    *
    * Per iteration: one broadcast join + one (cell, dim) hash
    * aggregation with map-side partial sums — both scale linearly in
    * corpus size. Each round's centroid frame (tiny: C × dims longs) is
    * persisted and materialized before the next round plans against it,
    * so `iters` rounds never stack into one exponential lazy plan; the
    * previous round's cache is released as soon as its successor exists.
    * The RETURNED frame stays persisted — `.unpersist()` it when done.
    */
  def kmeansCentroids(corpus: DataFrame, init: DataFrame,
      iters: Int): DataFrame = {
    var cents = init.select("vec_id", "qv", "n2")
    var prev: Option[DataFrame] = None
    (0 until iters).foreach { _ =>
      val assigned = ivfAssign(corpus, cents)
      val dims = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("nx"))
        .withColumn("m", expr("sx div nx"))
      cents = dims.groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("vec_id"),
          transform(col("pm"), s => s.getField("m")).as("qv"))
        .withColumn("n2", norm2(col("qv")))
        // a cell whose member sums cancel to the zero vector would have
        // n2 = 0 → NaN cosine next iteration, and Spark sorts NaN above
        // every double, so the dead cell would swallow the whole corpus;
        // drop it like an emptied cell instead
        .where(col("n2") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cents.count() // materialize: the next round plans against the cache
      prev.foreach(_.unpersist())
      prev = Some(cents)
    }
    cents
  }

  /** Multi-probe cell assignment: the top-`probes` cells per vector by
    * centroid cosine (ties by centroid id). Probing P cells instead of 1
    * recovers the recall lost to near-boundary queries at P× the
    * candidate cost — still (N/C)×Q×P, never N×Q. Corpus vectors keep
    * single-cell assignment ([[ivfAssign]]); only the (small) query set
    * fans out, so the probe rows ride in the same broadcast.
    */
  def ivfAssignProbes(vectors: DataFrame, centroids: DataFrame,
      probes: Int): DataFrame = {
    val cents = centroids.select(col("vec_id").as("c_id"), col("qv").as("cv"),
      col("n2").as("cn2"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("c_id"))
    vectors.crossJoin(broadcast(cents))
      .withColumn("ccos",
        cosine(dotq(col("qv"), col("cv")), col("n2"), col("cn2")))
      .withColumn("probe_rk", row_number().over(w))
      .where(col("probe_rk") <= probes)
      .select(col("vec_id"), col("qv"), col("n2"), col("c_id").as("cell"))
  }

  /** Multi-probe IVF top-k: corpus assigned to single cells, queries
    * probing their [[ivfAssignProbes]] cells. A neighbor lives in exactly
    * one cell and a query's probe cells are distinct, so no candidate
    * pair appears twice — the window ranks each candidate once.
    */
  def ivfTopKProbed(assigned: DataFrame, queryProbes: DataFrame,
      k: Int): DataFrame = {
    val qs = queryProbes.select(col("vec_id").as("q_id"),
      col("qv").as("quv"), col("n2").as("qn2"), col("cell").as("q_cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    assigned
      .select(col("vec_id").as("n_id"), col("qv").as("nv"),
        col("n2").as("nn2"), col("cell"))
      .join(broadcast(qs), col("cell") === col("q_cell"))
      .where(col("n_id") =!= col("q_id"))
      .withColumn("cos",
        cosine(dotq(col("quv"), col("nv")), col("qn2"), col("nn2")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
  }

  /** Sign-bit signature over the first `bits` dimensions — an exact-dup
    * key for quantized embeddings and a coarse LSH bucket for near-dups.
    */
  def signSignature(emb: Column, bits: Int = 16): Column =
    (0 until bits)
      .map(b => when(element_at(emb, b + 1) >= 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)

  /** Embedding near-dup pairs: sign-signature LSH buckets generate
    * candidates (equi-join on the bucket key — linear, never pairwise
    * over the corpus), exact quantized cosine verifies. The standard
    * bucket→verify shape that scales to 100 TB: bucket key is a shuffle
    * key, verification touches only bucket-mates.
    *
    * Degenerate-bucket cap (mirrors [[NearDup.lshNearDupPairs]]): with
    * only 2^sigBits buckets, one hot bucket — near-zero embeddings,
    * template content — would make the self-join quadratic in bucket
    * size. Buckets outside [2, maxBucket] generate no candidates (size-1
    * buckets never produced pairs anyway; oversized ones are dropped
    * before pairing, standard LSH practice). The keep-side aggregation
    * and both self-join inputs shuffle on the same `sig` key, so the
    * exchange is computed once and reused.
    */
  def nearDupPairs(p: DataFrame, sigBits: Int, minCos: Double,
      maxBucket: Int = 1000): DataFrame = {
    val s = p.withColumn("sig", signSignature(col("qv"), sigBits))
    val keep = s.groupBy("sig")
      .agg(count(lit(1)).as("bucket_size"))
      .where(col("bucket_size").between(2, maxBucket))
      .select("sig")
    val bounded = s.join(keep, "sig")
    val a = bounded.select(col("vec_id").as("d1"), col("qv").as("v1"),
      col("n2").as("na"), col("sig"))
    val b = bounded.select(col("vec_id").as("d2"), col("qv").as("v2"),
      col("n2").as("nb"), col("sig"))
    a.join(b, "sig")
      .where(col("d1") < col("d2"))
      .withColumn("cos", cosine(dotq(col("v1"), col("v2")), col("na"), col("nb")))
      .where(col("cos") >= minCos)
      .select("d1", "d2", "cos")
  }

  /** Semantic deduplication (the SemDeDup recipe — Abbas et al. 2023,
    * arXiv:2303.09540): partition the embedding space by nearest centroid
    * ([[ivfAssign]] — broadcast centroids, never pairwise over the
    * corpus), then inside each cell drop every vector whose exact cosine
    * to a LOWER-id cell-mate is ≥ `minCos`. The survivor rule is the
    * deterministic greedy "keep the minimum id of every ε-neighborhood":
    * near-identical *meaning* collapses even when no token overlaps —
    * the gap exact/MinHash/SimHash dedup can't close.
    *
    * Scale design: candidate generation is the cell equi-join, so
    * pairwise work is confined to cells (corpus/C per cell when centroids
    * are trained — [[kmeansCentroids]]); cells outside [2, maxCell]
    * generate no candidates (singletons pair with nothing; a degenerate
    * hot cell — near-zero or boilerplate embeddings — would go quadratic,
    * same cap as [[nearDupPairs]]). Both self-join sides and the
    * keep-side count shuffle on the same `cell` key: one exchange,
    * reused. Vectors in capped-out cells survive unexamined — at
    * production scale that cell's centroid needs splitting, which is a
    * training concern, not a dedup-pass concern. That blind spot is
    * MEASURABLE: [[semDedupAudited]] also returns the capped-cell audit
    * frame (how many cells blew the cap, how many vectors went
    * unexamined) so a 100 TB run sees the number instead of trusting
    * the scaladoc.
    *
    * The assignment subtree is consumed four times (keep-side count,
    * both self-join sides, the survivor anti-join). Since r10 the
    * assignment is a PER-ROW expression (zero shuffle — see
    * [[ivfAssign]]), so what repeats per consumer is map-side scoring
    * only, never a payload shuffle; the cell-keyed consumers still
    * collapse onto shared exchanges where their required partitioning
    * agrees (DESIGN rule 3: duplicated map compute is the cheap side of
    * the trade against shuffling every embedding byte).
    *
    * Returns the surviving (vec_id, cell) rows.
    */
  def semDedup(p: DataFrame, centroids: DataFrame, minCos: Double,
      maxCell: Int = 10000): DataFrame =
    semDedupAudited(p, centroids, minCos, maxCell)._1

  /** [[semDedup]] plus its blind-spot audit: the second frame is ONE row
    * `(n_capped_cells, n_unexamined_vectors)` — cells whose population
    * exceeded `maxCell` and therefore generated no candidate pairs, and
    * the vectors inside them that survived UNEXAMINED. Production runs
    * should alert when the unexamined count is material (the fix is
    * retraining/splitting those centroids, not raising the cap into
    * quadratic pair generation). The audit rides the same cell-count
    * aggregate the survivor path already plans (ReuseExchange collapses
    * the scan), and costs nothing unless actually executed.
    */
  def semDedupAudited(p: DataFrame, centroids: DataFrame, minCos: Double,
      maxCell: Int = 10000): (DataFrame, DataFrame) = {
    val assigned = ivfAssign(p, centroids)
    val cellSizes = assigned.groupBy("cell")
      .agg(count(lit(1)).as("cell_size"))
    val capped = cellSizes.where(col("cell_size") > maxCell)
      .agg(
        count(lit(1)).as("n_capped_cells"),
        // sum over zero rows is null, not 0 — a clean run must say "0"
        coalesce(sum(col("cell_size")), lit(0L)).as("n_unexamined_vectors"))
    val keep = cellSizes
      .where(col("cell_size").between(2, maxCell))
      .select("cell")
    val bounded = assigned.join(keep, "cell")
    val a = bounded.select(col("vec_id").as("d1"), col("qv").as("v1"),
      col("n2").as("na"), col("cell"))
    val b = bounded.select(col("vec_id").as("d2"), col("qv").as("v2"),
      col("n2").as("nb"), col("cell"))
    val losers = a.join(b, "cell")
      .where(col("d1") < col("d2"))
      .withColumn("cos",
        cosine(dotq(col("v1"), col("v2")), col("na"), col("nb")))
      .where(col("cos") >= minCos)
      .select(col("d2").as("vec_id"))
      .distinct()
    val survivors = assigned.join(losers, Seq("vec_id"), "left_anti")
      .select("vec_id", "cell")
    (survivors, capped)
  }

  // --- product quantization (PQ) ---

  /** Exact squared L2 between two quantized subvectors (native fused
    * form — see [[norm2]]). */
  private def d2q(a: Column, b: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.GraftFunctions.register(s)
        call_function(graft.functions.GraftFunctions.QD2Name, a, b)
      case None =>
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x)
    }

  /** Explode prepared vectors into `m` equal subvectors:
    * (id, sub_id, sv). Dimension must divide evenly by m (64-dim
    * embeddings, m=4 → 16-dim subvectors). Pure per-row HOFs — no
    * shuffle.
    */
  def pqSubvectors(p: DataFrame, m: Int, idAs: String = "vec_id"): DataFrame = {
    val sd = (size(col("qv")) / m).cast("int")
    p.select(col("vec_id").as(idAs),
        explode(sequence(lit(0), lit(m - 1))).as("sub_id"),
        col("qv"))
      .select(col(idAs), col("sub_id"),
        slice(col("qv"), col("sub_id") * sd + 1, sd).as("sv"))
  }

  /** Deterministic sampled codebook: the donor vectors (a small, caller-
    * chosen subset — e.g. `vec_id < 16`) each contribute their subvectors
    * as centroids, giving (sub_id, code, cv) with code = donor id. A
    * production pipeline would train each subspace with
    * [[kmeansCentroids]]; sampling keeps the codebook reproducible and
    * cross-engine checkable while exercising the identical encode/ADC
    * machinery. Codebooks are tiny (m × k × subdim longs) — always
    * broadcast.
    */
  def pqCodebook(donors: DataFrame, m: Int): DataFrame =
    pqSubvectors(donors, m, idAs = "code")
      .select(col("sub_id"), col("code"), col("sv").as("cv"))

  /** TRAINED PQ codebooks — the production counterpart the
    * [[pqCodebook]] scaladoc promises: per-subspace Lloyd iterations
    * over [[pqSubvectors]], L2 metric (PQ quantizes subvector
    * distances, not angles). Init = the sampled donor codebook (first
    * `k` vectors, code = donor id), so "trained" is literally "sampled,
    * then improved" — the recall comparison is apples to apples. Each
    * round: assign every subvector to its nearest centroid by exact
    * squared L2 (ties to the smallest code — one broadcast join + one
    * map-side-combinable min_by, the corpus never shuffles wider than
    * (vec_id, sub_id)), then recompute each code's centroid as the
    * elementwise integer mean (`div`: truncation toward zero, exact and
    * partitioning-independent). A code that loses all members drops
    * out. Same per-iteration persist/materialize/release discipline as
    * [[kmeansCentroids]]: `iters` rounds never stack into one lazy
    * plan, and the previous round's cache is released as soon as its
    * successor is materialized. The final codebook — m × k rows BY
    * DEFINITION tiny (it gets broadcast downstream) — is returned as a
    * LOCAL frame: the last round's cache is released before returning,
    * so repeated callers (a bench sweep, a long-lived session) leak no
    * block-manager entries, and downstream broadcasts build from local
    * rows instead of a distributed scan.
    */
  def pqTrainCodebooks(p: DataFrame, m: Int, k: Int,
      iters: Int): DataFrame = {
    val subs = pqSubvectors(p, m)
    var cb = pqCodebook(p.where(col("vec_id") < k), m)
    var prev: Option[DataFrame] = None
    (0 until iters).foreach { _ =>
      val assigned = subs
        .join(broadcast(cb), "sub_id")
        .withColumn("d2", d2q(col("sv"), col("cv")))
        .groupBy("vec_id", "sub_id")
        .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"),
          first(col("sv")).as("sv")) // sv is constant per group
      cb = assigned
        .select(col("sub_id"), col("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub_id", "code", "pos")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("nx"))
        .withColumn("cm", expr("sx div nx"))
        .groupBy("sub_id", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("cm")))).as("pm"))
        .select(col("sub_id"), col("code"),
          transform(col("pm"), s => s.getField("cm")).as("cv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cb.count() // materialize: the next round plans against the cache
      prev.foreach(_.unpersist())
      prev = Some(cb)
    }
    val rows = cb.collect().toSeq
    prev.foreach(_.unpersist()) // nothing stays pinned after training
    import scala.jdk.CollectionConverters._
    cb.sparkSession.createDataFrame(rows.asJava, cb.schema)
  }

  /** PQ encoding: each vector's subvector → nearest codebook centroid by
    * exact squared L2 (ties to the smallest code). Output (vec_id,
    * sub_id, code) — the m-byte-per-vector compressed representation.
    * One broadcast join + one map-side-combinable min_by agg; the corpus
    * never shuffles on anything wider than (vec_id, sub_id).
    */
  def pqEncode(p: DataFrame, codebook: DataFrame, m: Int): DataFrame =
    pqSubvectors(p, m)
      .join(broadcast(codebook), "sub_id")
      .withColumn("d2", d2q(col("sv"), col("cv")))
      .groupBy("vec_id", "sub_id")
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))

  /** Asymmetric-distance (ADC) top-k: the query keeps its EXACT
    * subvectors; every corpus vector is represented only by its codes.
    * Per query a (m × k)-entry distance table is precomputed
    * (query-subvector ↔ centroid), then each neighbor's approximate
    * distance is the sum of m table lookups — the scan touches m small
    * ints per vector instead of the full float vector, which is PQ's
    * memory-bandwidth win at corpus scale.
    *
    * Plan shape: distance table = (small queries) × (tiny codebook),
    * broadcast; codes join it on (sub_id, code) with no corpus-side
    * pre-shuffle; the (q_id, n_id) sum is one hash agg with map-side
    * partials; top-k is a per-query window over k·|Q| surviving rows.
    */
  /** IVF-PQ (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): the composed production ANN shape — the IVF
    * coarse quantizer restricts each query's ADC scan to its own cell,
    * so the scan touches (corpus/cells) × m codes instead of the whole
    * code table, and the PQ codes keep the per-vector memory at m
    * small ints. Composition of [[ivfAssign]] + [[pqEncode]] +
    * [[pqTopK]]'s ADC with a cell-consistency predicate; the cell map
    * joins equi on the vector id, the distance table (now carrying the
    * query's cell) stays broadcast.
    */
  def ivfPqTopK(assigned: DataFrame, codes: DataFrame, codebook: DataFrame,
      queryIds: Column, m: Int, topK: Int): DataFrame = {
    val queries = assigned.where(queryIds).select(col("vec_id"), col("qv"))
    val qcells = assigned.where(queryIds)
      .select(col("vec_id").as("q_id"), col("cell").as("q_cell"))
    val qsub = pqSubvectors(queries, m, idAs = "q_id")
    val table = qsub.join(codebook, "sub_id")
      .select(col("q_id"), col("sub_id"), col("code"),
        d2q(col("sv"), col("cv")).as("td2"))
      .join(qcells, "q_id")
    val ncells = assigned.select(col("vec_id").as("n_id"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ad2"), col("n_id"))
    codes.select(col("vec_id").as("n_id"), col("sub_id"), col("code"))
      .join(ncells, "n_id")
      .join(broadcast(table), Seq("sub_id", "code"))
      .where(col("n_id") =!= col("q_id") && col("cell") === col("q_cell"))
      .groupBy("q_id", "n_id")
      .agg(sum(col("td2")).as("ad2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= topK)
      .select("q_id", "rk", "n_id", "ad2")
  }

  def pqTopK(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
      m: Int, topK: Int): DataFrame = {
    val qsub = pqSubvectors(queries, m, idAs = "q_id")
    val table = qsub.join(codebook, "sub_id")
      .select(col("q_id"), col("sub_id"), col("code"),
        d2q(col("sv"), col("cv")).as("td2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ad2"), col("n_id"))
    codes.select(col("vec_id").as("n_id"), col("sub_id"), col("code"))
      .join(broadcast(table), Seq("sub_id", "code"))
      .where(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id")
      .agg(sum(col("td2")).as("ad2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= topK)
      .select("q_id", "rk", "n_id", "ad2")
  }
}
