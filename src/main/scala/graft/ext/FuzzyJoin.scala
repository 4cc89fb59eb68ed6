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
  * impossible at corpus scale. This implements LOSSLESS prefix-filter
  * blocking (Ed-Join — Xiao, Wang & Lin, VLDB 2008; prefix principle
  * from SSJoin — Chaudhuri, Ganti & Kaushik, ICDE 2006):
  *
  *  - every string exposes its DISTINCT positional q-grams; a single
  *    edit destroys at most q gram values, so two strings within edit
  *    distance d share all but ≤ q·d of their gram-value sets;
  *  - order all grams globally by (corpus frequency asc, gram asc) and
  *    keep each string's first q·d+1 — its PREFIX. If ed(s,t) ≤ d, the
  *    globally-smallest SHARED gram value g must sit inside both
  *    prefixes (were g outside s's prefix, s would own q·d+1 values
  *    smaller than g, all necessarily unshared — more than q·d edits
  *    can destroy). So equi-joining on prefix grams finds EVERY true
  *    pair: the oracle (q_fuzzy_pairs) hash-matches against DuckDB's
  *    brute-force ground truth, proving recall 1.0, not estimating it.
  *
  * Scale shape: the gram-frequency table is bounded by charset^q rows
  * (≤ ~10k for q=2 over ASCII) — broadcast by construction, never a
  * shuffle of the corpus. The prefix rank is a per-string window
  * (groups ≤ string length). Candidate blocks key on the RAREST grams
  * each string owns — frequency ordering is itself the skew defense: a
  * universal prefix like "https://www." sorts LAST and never becomes a
  * block key. The degenerate corpus (everything pairwise-similar) has
  * output-bound block sizes — candidates ≈ answers, the floor any
  * complete algorithm pays.
  */
object FuzzyJoin {

  /** All (id1 < id2) pairs of `df` rows whose `strCol` values are
    * within levenshtein distance `d`, found via prefix-filter blocking
    * and verified exactly. Output: (id1, id2, str1, str2, dist).
    *
    * The filter's guarantee needs a surviving gram OCCURRENCE: a
    * string with len − q + 1 ≤ q·d gram occurrences can lose ALL of
    * them to d edits and share no gram value with a true match
    * ("ab"→"ax" at q=2, d=1 shares nothing). So strings of length
    * ≤ q(d+1)−1 bypass the filter through an exact short-string path:
    * their partners all have length ≤ q(d+1)−1+d, a length-bounded
    * population that broadcast-joins against the shorties (at corpus
    * scale, names/URLs/titles live far above this cutoff — the short
    * set is census noise; FuzzyJoinSpec still proves the routing).
    */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
      d: Int, q: Int = 2): DataFrame = {
    require(d >= 1 && q >= 1, "d and q must be >= 1")
    val rows = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))
    // below this, d edits can destroy every gram occurrence
    val shortCut = q * (d + 1) - 1

    // distinct q-gram VALUES per string (set semantics — the prefix
    // bound above is proved for sets)
    val gramsReal = rows.where(col("len") > shortCut)
      .select(col("id"), col("s"), col("len"),
        explode(array_distinct(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> substring(s, i, $q))"
        ))).as("gram"))

    // corpus gram frequencies: ≤ charset^q rows — broadcast always
    val freq = gramsReal.groupBy("gram").agg(count(lit(1)).as("freq"))

    // per-string prefix: the q·d+1 globally-rarest gram values
    val prefixLen = q * d + 1
    val w = Window.partitionBy("id").orderBy(col("freq"), col("gram"))
    val prefix = gramsReal.join(broadcast(freq), "gram")
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= prefixLen)
      .select(col("gram"), col("id"), col("s"), col("len"))

    // candidates: strings sharing a prefix gram, inside the length band
    val a = prefix
    val b = prefix.select(col("gram"), col("id").as("id2"),
      col("s").as("s2"), col("len").as("len2"))
    val gramPairs = a.join(b, "gram")
      .where(col("id") < col("id2") &&
        abs(col("len") - col("len2")) <= d)
      .select(col("id"), col("id2"), col("s"), col("s2"))

    // short-string path: len ≤ q(d+1)−1 strings can evade the gram
    // filter entirely; their partners all live within the length band
    // — a bounded population, broadcast
    val shortish = rows.where(col("len") <= shortCut + d)
    val shorty = rows.where(col("len") <= shortCut)
    val lt = col("ia") < col("ib")
    val shortPairs = shorty.select(col("id").as("ia"), col("s").as("sa"))
      .join(broadcast(shortish.select(col("id").as("ib"),
        col("s").as("sb"))), col("ia") =!= col("ib"))
      .select(
        when(lt, col("ia")).otherwise(col("ib")).as("id"),
        when(lt, col("ib")).otherwise(col("ia")).as("id2"),
        when(lt, col("sa")).otherwise(col("sb")).as("s"),
        when(lt, col("sb")).otherwise(col("sa")).as("s2"))

    gramPairs.union(shortPairs)
      .distinct()
      .withColumn("dist", levenshtein(col("s"), col("s2")))
      .where(col("dist") <= d)
      .select(col("id").as("id1"), col("id2"),
        col("s").as("str1"), col("s2").as("str2"),
        col("dist").cast("long").as("dist"))
  }
}
