package graft

import graft.functions.StringSim
import org.scalatest.funsuite.AnyFunSuite

/** Golden values below were sampled from DuckDB 1.0.0
  * `jaro_winkler_similarity` (the driver's oracle) — parity with the oracle
  * is the correctness contract, not any one textbook variant. */
class StringSimSpec extends AnyFunSuite {

  val golden: Seq[(String, String, Double)] = Seq(
    ("", "", 0.0),
    ("a", "", 0.0),
    ("", "b", 0.0),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.8400000000000001),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("acme corp", "acme crop", 0.9777777777777777),
    ("bakozu corp", "bakozu", 0.9090909090909091),
    ("abcdef", "abcdef", 1.0),
    ("cgabbf", "adabggbdbg", 0.6055555555555555),
    ("b", "agad", 0.0),
    ("c", "gcbec", 0.7333333333333334),
    ("df", "ba", 0.0),
    ("dhgfhhfedc", "dbehfhebbgcf", 0.6182539682539682),
    ("hga", "bfffhhbbehb", 0.47474747474747475),
    ("e", "hegfahfcbha", 0.6969696969696969),
    ("ecdg", "hbchgec", 0.5952380952380952),
    ("egfgdcb", "cdd", 0.4920634920634921),
    ("h", "ceeacgffca", 0.0),
    ("ggggbhga", "bdhc", 0.4583333333333333),
    ("fa", "ac", 0.0),
    ("bfabdgcef", "fhbbhhhheb", 0.5314814814814816),
    ("bfe", "cadfcaeb", 0.4861111111111111),
    ("efcfdfdddgdd", "hfaaehedf", 0.4259259259259259),
    ("ffbdbdhd", "dhahfb", 0.5555555555555555),
    ("bgdhcgfbghg", "bcccachchfcc", 0.4904040404040404),
    ("a", "bcgddaededfe", 0.6944444444444443),
    ("gcafhgcca", "caccchba", 0.75),
    ("hbadde", "b", 0.7222222222222223),
  )

  test("jaro-winkler matches DuckDB golden values") {
    golden.foreach { case (a, b, expect) =>
      assert(math.abs(StringSim.jaroWinkler(a, b) - expect) < 1e-12,
        s"jw($a, $b) = ${StringSim.jaroWinkler(a, b)}, expected $expect")
    }
  }

  test("jaro-winkler properties: range, symmetry, identity (seeded sweep)") {
    val rng = new scala.util.Random(42)
    def word(): String =
      (0 until rng.nextInt(20)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val a = word(); val b = word()
      val v = StringSim.jaroWinkler(a, b)
      assert(v >= 0.0 && v <= 1.0, s"out of range: jw($a, $b) = $v")
      assert(v == StringSim.jaroWinkler(b, a), s"asymmetric on ($a, $b)")
      if (a.nonEmpty) assert(StringSim.jaroWinkler(a, a) == 1.0)
    }
  }

  test("cosine: identity 1, orthogonal 0, zero-norm 0") {
    val a = Array(1.0, 2.0, 3.0)
    assert(math.abs(StringSim.cosine(a, a) - 1.0) < 1e-12)
    assert(StringSim.cosine(Array(1.0, 0.0), Array(0.0, 1.0)) == 0.0)
    assert(StringSim.cosine(Array(0.0, 0.0), Array(1.0, 1.0)) == 0.0)
    // DuckDB: list_cosine_similarity([1,2,3],[3,4,5]) = 0.9827076298239908
    assert(math.abs(StringSim.cosine(Array(1.0, 2.0, 3.0), Array(3.0, 4.0, 5.0))
      - 0.9827076298239908) < 1e-12)
  }
}
