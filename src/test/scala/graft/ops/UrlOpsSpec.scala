package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class UrlOpsSpec extends AnyFunSuite {

  test("absolute urls pass through untouched") {
    assert(UrlOps.resolveUrl("https://b.test/", "http://a.test/x.jpg")
      == "http://a.test/x.jpg")
    assert(UrlOps.resolveUrl(null, "https://a.test/x.jpg")
      == "https://a.test/x.jpg")
  }

  test("relative resolution against a directory base") {
    assert(UrlOps.resolveUrl("https://ex.test/a/b/", "img/c.jpg")
      == "https://ex.test/a/b/img/c.jpg")
    assert(UrlOps.resolveUrl("https://ex.test/a/b/page.html", "img/c.jpg")
      == "https://ex.test/a/b/img/c.jpg")
  }

  test("root-relative and protocol-relative") {
    assert(UrlOps.resolveUrl("https://ex.test/a/b/", "/abs/c.png")
      == "https://ex.test/abs/c.png")
    assert(UrlOps.resolveUrl("https://ex.test/a/b/", "//cdn.test/c.png")
      == "https://cdn.test/c.png")
  }

  test("unresolvable input falls back to the original url (main.py:107-110)") {
    assert(UrlOps.resolveUrl("ht tp://broken base", "img/c.jpg") == "img/c.jpg")
    assert(UrlOps.resolveUrl("", "img/c.jpg") == "img/c.jpg")
    assert(UrlOps.resolveUrl("https://ex.test/", null) == null)
  }

  test("base resolution keeps the PAGE url on failure (main.py:158-164)") {
    // malformed <base href> → base stays the page url, not the junk value
    assert(UrlOps.resolveBase("https://ex.test/a/", "ht tp://bro ken")
      == "https://ex.test/a/")
    // well-formed head base resolves normally
    assert(UrlOps.resolveBase("https://ex.test/a/page.html", "sub/")
      == "https://ex.test/a/sub/")
    assert(UrlOps.resolveBase("https://ex.test/a/", "https://cdn.test/b/")
      == "https://cdn.test/b/")
    // absent head base → page url
    assert(UrlOps.resolveBase("https://ex.test/a/", null) == "https://ex.test/a/")
  }

  test("property: resolution of an absolute url is the identity") {
    val absGen = for {
      scheme <- Gen.oneOf("http://", "https://")
      host <- Gen.alphaLowerStr.suchThat(_.nonEmpty)
      path <- Gen.alphaNumStr
    } yield s"$scheme$host.test/$path"
    val pairs = Gen.listOfN(200, Gen.zip(absGen, absGen))
      .apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    assert(pairs.nonEmpty)
    pairs.foreach { case (base, url) =>
      assert(UrlOps.resolveUrl(base, url) == url)
    }
  }
}
