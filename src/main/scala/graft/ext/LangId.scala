package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Character-bigram language identification — the classic n-gram
  * heuristic: build per-language bigram frequency profiles from sample
  * text, classify by cosine similarity of the document's profile against
  * each language's.
  *
  * The profiles are a small driver-side model broadcast to executors;
  * classification runs in mapPartitions (model deserialized once per
  * partition, not per row). Complements the relational marker-word scorer
  * in TextAnalysis (which is oracle-checkable); this one is the higher-
  * fidelity library form.
  */
object LangId {

  type Profile = Map[String, Double]

  /** Normalized char-bigram frequencies of a text; null-safe (scraped
    * corpora have null text rows).
    */
  def profile(text: String): Profile = {
    if (text == null) return Map.empty
    val t = "_" + text.toLowerCase.replaceAll("[^\\p{L} ]", "")
      .replaceAll(" +", "_") + "_"
    if (t.length < 2) return Map.empty
    val counts = t.sliding(2).foldLeft(Map.empty[String, Int]) { (m, bg) =>
      m.updated(bg, m.getOrElse(bg, 0) + 1)
    }
    val total = counts.values.sum.toDouble
    counts.map { case (k, v) => k -> v / total }
  }

  def cosine(a: Profile, b: Profile): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val dot = a.iterator.map { case (k, v) => v * b.getOrElse(k, 0.0) }.sum
    val na = math.sqrt(a.valuesIterator.map(v => v * v).sum)
    val nb = math.sqrt(b.valuesIterator.map(v => v * v).sum)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
  }

  /** Train one profile per language from sample documents. */
  def train(samples: Map[String, Seq[String]]): Map[String, Profile] =
    samples.map { case (lang, texts) => lang -> profile(texts.mkString(" ")) }

  /** Prepared classifier: model sorted once, per-language norms
    * precomputed; the per-document profile and its norm are computed once
    * and scored against every language. Use this form on the hot path.
    */
  def classifier(model: Map[String, Profile]): String => (String, Double) = {
    // deterministic: ties broken by language name (sorted once, not per row)
    val langs = model.toSeq.sortBy(_._1).map { case (lang, prof) =>
      (lang, prof, math.sqrt(prof.valuesIterator.map(v => v * v).sum))
    }
    text => {
      val p = profile(text)
      if (langs.isEmpty || p.isEmpty) ("und", 0.0)
      else {
        val np = math.sqrt(p.valuesIterator.map(v => v * v).sum)
        val best = langs.map { case (lang, prof, nl) =>
          val dot = p.iterator.map { case (k, v) => v * prof.getOrElse(k, 0.0) }.sum
          (lang, if (np == 0.0 || nl == 0.0) 0.0 else dot / (np * nl))
        }.maxBy(_._2)
        if (best._2 == 0.0) ("und", 0.0) else best
      }
    }
  }

  /** Classify one text: (language, confidence = best cosine). */
  def classify(model: Map[String, Profile])(text: String): (String, Double) =
    classifier(model)(text)

  /** Dataset stage: (id, text) → (id, pred_lang, confidence). The model
    * is broadcast; the prepared classifier is built once per partition.
    * The id column keeps whatever type it has (long, string, struct, …) —
    * rows pass through as Rows, so no encoder pins it to bigint.
    */
  def classifyColumn(df: DataFrame, idCol: String, textCol: String,
      model: Map[String, Profile]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val in = df.select(idCol, textCol)
    require(in.schema.fields(1).dataType == StringType,
      s"$textCol must be a string column, got ${in.schema.fields(1).dataType}")
    val outSchema = StructType(Seq(
      in.schema.fields.head,
      StructField("pred_lang", StringType, nullable = false),
      StructField("confidence", DoubleType, nullable = false)))
    in.mapPartitions { it =>
      val classify = LangId.classifier(bc.value)
      it.map { r =>
        val (lang, conf) = classify(if (r.isNullAt(1)) null else r.getString(1))
        Row(r.get(0), lang, conf)
      }
    }(Encoders.row(outSchema))
  }
}
