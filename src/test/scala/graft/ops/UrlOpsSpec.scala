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
