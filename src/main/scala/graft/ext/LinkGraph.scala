package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-level link-graph analytics over extracted (page_url, url) rows:
  * edge construction and an integer-exact PageRank (Page/Brin/Motwani/
  * Winograd, 1999 — the public formulation).
  *
  * PageRank runs in MICRO-scaled integer arithmetic so ranks are
  * bit-identical cross-engine (the repo's oracle standard): with
  * damping d = 0.85 and r₀ = 10⁶ per node,
  *
  *   c_k(u)   = r_k(u) div outdeg(u)            // per-edge contribution
  *   r_{k+1}(v) = 150000 + (850 × Σ c_k(u→v)) div 1000
  *
  * Every operand is positive, so floor div == trunc div on both
  * engines. Dangling-node mass is dropped (the classic simplified
  * variant) — mirrored exactly by the oracle.
  *
  * Scale shape (100 TB): each iteration is one equi-join of the edge
  * list with the rank frame on the source key + one combinable sum by
  * destination + one left join back to the node set — the textbook
  * distributed PR step, AQE-skew-splittable on hub keys (a hub's
  * in-edges are many ROWS through a combinable agg, never one
  * partition's window). Iterations compose in ONE plan here (fixed
  * small iteration count ⇒ linear plan growth); a long-horizon run
  * would persist per round exactly like Similarity.kmeans does.
  */
object LinkGraph {

  /** Distinct directed host→host edges (self-loops and empty hosts
    * dropped) from (page_url, url) rows.
    */
  def hostEdges(df: DataFrame, pageUrl: Column, url: Column): DataFrame = {
    def host(u: Column) = lower(UrlAnalysis.host(u))
    df.select(host(pageUrl).as("src"), host(url).as("dst"))
      .where(col("src") =!= "" && col("dst") =!= "" &&
        col("src") =!= col("dst"))
      .distinct()
  }

  /** Integer PageRank over a distinct edge list; returns
    * (host, rank_micro) for every node appearing as source or sink.
    */
  def pagerankMicro(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters $iters outside [1, 8]: iterations compose into one plan " +
        "(persist per round beyond that, like Similarity.kmeans)")
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
    val od = edges.groupBy("src").agg(count(lit(1)).as("od"))
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val c = edges
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .join(od, "src")
        .select(col("dst"), expr("r div od").as("c"))
      val s = c.groupBy("dst").agg(sum("c").as("s"))
      ranks = nodes
        .join(s.withColumnRenamed("dst", "host"), Seq("host"), "left")
        .select(col("host"),
          expr("150000 + (850 * coalesce(s, 0)) div 1000").as("r"))
    }
    ranks.select(col("host"), col("r").as("rank_micro"))
  }

  /** Integer HITS (Kleinberg, "Authoritative Sources in a Hyperlinked
    * Environment", JACM 1999) — hub/authority scores, `iters` full
    * mutual-reinforcement rounds UNNORMALIZED: with hub₀ = 1,
    *
    *   auth_k(a) = Σ_{b→a} hub_{k-1}(b)
    *   hub_k(b)  = Σ_{b→a} auth_k(a)
    *
    * Normalization only rescales (ranking identical), and skipping it
    * keeps every value an exact integer on any engine; magnitudes grow
    * like (max degree)² per round, so the guard keeps iters small —
    * degrees up to ~10⁴ stay far inside int64 at iters ≤ 2.
    *
    * Scale shape: same as [[pagerankMicro]] — per round two equi-joins
    * of the edge list with the score frames + two combinable sums; hub
    * keys are many rows through a hash agg, never a window.
    */
  def hitsScores(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 3,
      s"iters $iters outside [1, 3]: unnormalized integer scores grow " +
        "~(max degree)^2 per round; normalize-and-persist beyond that")
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
    var hub = nodes.select(col("host"), lit(1L).as("h"))
    var auth = nodes.select(col("host"), lit(0L).as("a"))
    for (_ <- 1 to iters) {
      val aSum = edges
        .join(hub.withColumnRenamed("host", "src"), "src")
        .groupBy("dst").agg(sum("h").as("s"))
      auth = nodes
        .join(aSum.withColumnRenamed("dst", "host"), Seq("host"), "left")
        .select(col("host"), coalesce(col("s"), lit(0L)).as("a"))
      val hSum = edges
        .join(auth.withColumnRenamed("host", "dst"), "dst")
        .groupBy("src").agg(sum("a").as("s"))
      hub = nodes
        .join(hSum.withColumnRenamed("src", "host"), Seq("host"), "left")
        .select(col("host"), coalesce(col("s"), lit(0L)).as("h"))
    }
    auth.join(hub, "host")
      .select(col("host"), col("a").as("authority"), col("h").as("hub"))
  }
}
