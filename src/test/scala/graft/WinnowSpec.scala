package graft

import graft.functions.TextFns
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprint (TextFns.winnowHashes) — pure-function suite.
  * The SQL-parity of the hash values themselves is gated by the q33
  * driver oracle; here we gate the algorithmic guarantees. */
class WinnowSpec extends AnyFunSuite {

  private val k = 5
  private val w = 8

  test("deterministic and case-insensitive") {
    val t = "The quick brown fox jumps over the lazy dog"
    val a = TextFns.winnowHashes(t, k, w).toSeq
    assert(a == TextFns.winnowHashes(t, k, w).toSeq)
    assert(a == TextFns.winnowHashes(t.toUpperCase, k, w).toSeq)
    assert(a.nonEmpty && a == a.sorted && a.distinct == a)
  }

  test("short texts: below k chars empty, below w+k-1 chars one global min") {
    assert(TextFns.winnowHashes("abcd", k, w).isEmpty)
    val t = "abcdefgh" // 4 k-grams < w -> single window = global min
    val hs = TextFns.winnowHashes(t, k, w)
    assert(hs.length == 1)
  }

  test("winnowing guarantee: docs sharing a substring of length >= w+k-1 share a hash") {
    // plant a common run of w+k-1 chars inside otherwise-different docs
    val common = "zqxjkvwpbmfy" // 12 = w+k-1 chars
    assert(common.length == w + k - 1)
    val d1 = s"first document body with $common inside it somewhere"
    val d2 = s"a completely different text; $common appears here too"
    val h1 = TextFns.winnowHashes(d1, k, w).toSet
    val h2 = TextFns.winnowHashes(d2, k, w).toSet
    assert((h1 & h2).nonEmpty, "no shared fingerprint for a w+k-1 common substring")
  }

  test("unrelated docs share no fingerprints (collision sanity at 60 bits)") {
    val h1 = TextFns.winnowHashes("entity resolution over conversational transcripts", k, w).toSet
    val h2 = TextFns.winnowHashes("0123456789 numeric payload without overlap", k, w).toSet
    assert((h1 & h2).isEmpty)
  }

  test("density: fingerprint count is ~2/(w+1) of positions, bounded") {
    // non-periodic pseudorandom text (a periodic one collapses the
    // distinct-minima set to ~period/w values)
    val rnd = new scala.util.Random(42)
    val text = Array.fill(520)(('a' + rnd.nextInt(26)).toChar).mkString
    val hs = TextFns.winnowHashes(text, k, w)
    val n = text.length - k + 1
    // expected density 2/(w+1) ~ 0.22 of positions before the distinct cut
    assert(hs.length <= n)
    assert(hs.length >= n / (2 * (w + 1)), s"suspiciously few fingerprints: ${hs.length} of $n")
  }
}
