package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ×100 decade rests on the substitution ring's guarantees: enough
  * distinct symbols for ≥ 100 vocabulary-disjoint replicas, and — the
  * property the whole fixture model leans on — any two DISTINCT
  * rotations of the ring disagree on EVERY symbol, so no token can
  * collide between replicas.
  */
class ScaleProbeRingSpec extends AnyFunSuite {

  test("ring: >= 100 distinct symbols, covers the base alphabet") {
    assert(ScaleProbe.Ring.length == ScaleProbe.MaxFactor)
    assert(ScaleProbe.MaxFactor >= 100, "the x100 decade needs period >= 100")
    assert(ScaleProbe.Ring.distinct == ScaleProbe.Ring,
      "duplicate ring symbols would break the rotation bijection")
    ("abcdefghijklmnopqrstuvwxyz" + "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
      .foreach(c => assert(ScaleProbe.Ring.contains(c),
        s"base-alphabet char '$c' must sit on the ring"))
  }

  test("distinct rotations disagree on every symbol (vocabulary disjointness)") {
    val r = ScaleProbe.Ring
    def rot(k: Int): Map[Char, Char] =
      r.zip(r.drop(k) + r.take(k)).toMap
    // identity vs every k, plus a sample of pairwise combos — a cycle
    // rotation by k != 0 has no fixed point, and rot(a) vs rot(b) is
    // rot(a-b) composed with a bijection, so disagreement is total
    for (k <- Seq(1, 26, 52, 77, r.length - 1)) {
      val m = rot(k)
      assert(r.forall(c => m(c) != c), s"rotation $k has a fixed point")
    }
    for ((a, b) <- Seq((1, 2), (26, 52), (3, 99))) {
      val (ma, mb) = (rot(a), rot(b))
      assert(r.forall(c => ma(c) != mb(c)),
        s"rotations $a and $b agree on some symbol")
    }
  }
}
