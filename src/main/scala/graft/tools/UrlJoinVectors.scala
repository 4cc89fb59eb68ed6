package graft.tools

import graft.ops.UrlOps

/** Prints the engine's urljoin results for the committed adversarial
  * vector corpus (`tools/urljoin_vectors.tsv`) — the generator behind the
  * SURVEY §7.3 hazard audit (`java.net.URI.resolve` vs CPython
  * `urllib.parse.urljoin` on malformed input). Run it after touching
  * UrlOps/UrlResolve and diff against the committed file; the Python
  * column is produced once by CPython itself (the command is recorded in
  * the TSV header).
  */
object UrlJoinVectors {

  /** Adversarial (base, rel) corpus: dot segments (incl. excess),
    * query/fragment-only refs, protocol-relative, foreign schemes,
    * spaces, backslashes, schemeless/broken bases, pct-encoding,
    * non-ASCII, IPv6.
    */
  val Cases: Seq[(String, String)] = Seq(
    ("http://h/a/b", ""), ("http://h/a/b", "#frag"), ("http://h/a/b", "?q=1"),
    ("http://h/a/b/", "../../x"), ("http://h/a", "../../../x"),
    ("http://h/a/b", "./"), ("http://h/a/b", "."), ("http://h/a/b", ".."),
    ("http://h/a/b", "//cdn.test/x.png"), ("http://h/a/b", "/abs/x"),
    ("http://h/a/b", "mailto:u@x.test"), ("http://h/a/b", "HTTP://UP.TEST/x"),
    ("http://h/a/b", "x y z.jpg"), ("ht tp://broken base", "img/c.jpg"),
    ("http://h/a b/c", "img/c.jpg"), ("", "img/c.jpg"), ("http://h", "x"),
    ("http://h/a/b", "\\x\\y"), ("http://h/a/b?bq=2", "x"),
    ("http://h/a/b#bf", "x"), ("example.com/a", "b"),
    ("http://h/a/b", "g;p=1?y#s"), ("http://h/%7Euser/a", "x"),
    ("http://h/a/b", "é/ü.jpg"), ("http://h/a/./b/", "x"),
    ("http://[::1]:8080/a/", "x"), ("http://h/a/b", "data:text/plain,hi"),
    ("file:///a/b", "c"))

  def main(args: Array[String]): Unit =
    Cases.foreach { case (b, r) =>
      println(s"VEC\t$b\t$r\t${UrlOps.resolveUrl(b, r)}")
    }
}
