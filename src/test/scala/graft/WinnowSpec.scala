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

  test("O(n) deque equals the naive per-window min-scan (property, many shapes)") {
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnopqrstuvwxyz 0123456789")
    for {
      len <- Seq(0, 3, 4, 5, 6, 12, 13, 40, 200, 1000)
      alpha <- alphabets
      (kk, ww) <- Seq((5, 8), (3, 4), (2, 1), (4, 50))
      rep <- 1 to 3
    } {
      val t = Array.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val fast = TextFns.winnowHashes(t, kk, ww).toSeq
      val slow = TextFns.winnowHashesNaive(t, kk, ww).toSeq
      assert(fast == slow, s"mismatch len=$len k=$kk w=$ww alpha=${alpha.length} rep=$rep")
    }
    // adversarial: monotone-increasing and repeated-value hash runs
    for (t <- Seq("aaaaaaaaaaaaaaaaaaaaaaaa", "abababababababababab", "abcabcabcabcabcabc")) {
      assert(TextFns.winnowHashes(t, 3, 4).toSeq == TextFns.winnowHashesNaive(t, 3, 4).toSeq)
    }
  }

  test("long-document timing: deque is not slower than naive at w=64") {
    val rnd = new scala.util.Random(11)
    val book = Array.fill(400000)(('a' + rnd.nextInt(26)).toChar).mkString
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once
    TextFns.winnowHashes(book, 5, 64); TextFns.winnowHashesNaive(book, 5, 64)
    val (fast, tFast) = time(TextFns.winnowHashes(book, 5, 64).toSeq)
    val (slow, tSlow) = time(TextFns.winnowHashesNaive(book, 5, 64).toSeq)
    info(f"400k-char doc, w=64: deque=$tFast%.3fs naive=$tSlow%.3fs (${tSlow / tFast}%.1fx)")
    assert(fast == slow)
    assert(tFast <= tSlow * 1.5, f"deque unexpectedly slower: $tFast%.3f vs $tSlow%.3f")
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
