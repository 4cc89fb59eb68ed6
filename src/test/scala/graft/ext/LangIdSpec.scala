package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LangIdSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val samples = Map(
    "en" -> Seq(
      "the quick brown fox jumps over the lazy dog",
      "this is a sentence with common english words and the usual endings",
      "what you see is what you get when things are working well"),
    "es" -> Seq(
      "el rapido zorro marron salta sobre el perro perezoso",
      "esta es una frase con palabras comunes del idioma espanol",
      "lo que ves es lo que obtienes cuando las cosas funcionan bien"),
    "de" -> Seq(
      "der schnelle braune fuchs springt ueber den faulen hund",
      "dies ist ein satz mit haeufigen deutschen woertern und endungen",
      "was du siehst ist was du bekommst wenn alles gut funktioniert"))

  private val model = LangId.train(samples)

  test("held-out sentences classify to the right language") {
    assert(LangId.classify(model)("the weather is nice and the birds sing")._1 == "en")
    assert(LangId.classify(model)("las palabras de esta frase son espanolas")._1 == "es")
    assert(LangId.classify(model)("die kinder spielen gerne mit dem hund")._1 == "de")
  }

  test("empty/garbage input is 'und' with zero confidence") {
    assert(LangId.classify(model)("")._1 == "und")
    assert(LangId.classify(model)("12345 67890")._1 == "und")
  }

  test("distributed classification matches local classification") {
    val texts = Seq(
      (1L, "the weather is nice and the birds sing"),
      (2L, "las palabras de esta frase son espanolas"),
      (3L, "die kinder spielen gerne mit dem hund"))
    val got = LangId.classifyColumn(texts.toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == LangId.classify(model)(t)._1)
    }
  }

  test("classifyColumn accepts non-bigint id columns") {
    val texts = Seq(
      ("a", "the weather is nice and the birds sing"),
      ("b", "las palabras de esta frase son espanolas"),
      ("c", null))
    val got = LangId.classifyColumn(texts.toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") == "en")
    assert(got("b") == "es")
    assert(got("c") == "und") // null text is classified, not crashed on
  }
}
