package graft.functions

/** Pure string-similarity kernels shared by the Catalyst expressions
  * (graft.functions.expressions) and by unit/property tests.
  *
  * Jaro-Winkler follows the standard definition (Winkler 1990): Jaro
  * similarity with a prefix bonus of `0.1 * prefixLen * (1 - jaro)` applied
  * only when jaro > 0.7, prefix capped at 4. This matches DuckDB's
  * `jaro_winkler_similarity` (the driver's oracle) — verified pairwise in
  * JaroWinklerSpec against golden values sampled from DuckDB 1.0.0.
  *
  * Reference behavior: informagi/REL scores mention↔entity, not
  * mention↔mention, and has no string-similarity kernel (SURVEY.md §2.8);
  * this kernel is the ER-pipeline analogue mandated by BASELINE.json's
  * north_rule ("batched Jaro-Winkler/Levenshtein string similarity").
  */
object StringSim {

  /** Jaro similarity in [0,1]. Any empty input → 0.0 (including
    * empty-vs-empty, matching DuckDB's convention — the textbook
    * definition says 1.0 there, but the oracle wins). */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched2 = new Array[Boolean](l2)
    val matched1 = new Array[Boolean](l1)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched chars out of order; DuckDB (and the
    // rapidfuzz family) floor the halved count — match that exactly.
    var halfT = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = (halfT / 2).toDouble
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t) / m) / 3.0
  }

  /** Jaro-Winkler similarity in [0,1] with standard p=0.1, boost
    * threshold 0.7, prefix cap 4. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    var prefix = 0
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + 0.1 * prefix * (1.0 - j)
  }

  /** Cosine similarity of two equal-length vectors, accumulated in double.
    * Zero-norm input → 0.0. Mirrors DuckDB `list_cosine_similarity` on
    * DOUBLE[] inputs (sequential accumulation). */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}
