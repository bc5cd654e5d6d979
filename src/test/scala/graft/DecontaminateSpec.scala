package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("id", "text")

  test("planted n-gram overlaps are found, with exact gram counts") {
    val bench = df(1L -> "the quick brown fox jumps over the lazy dog")
    val corpus = df(
      // shares "quick brown fox jumps" (and 1 more 4-gram)
      10L -> "a quick brown fox jumps high",
      // shares nothing 4 tokens long (only a trigram overlap)
      11L -> "quick brown fox sleeps all day",
      // shares two disjoint 4-grams
      12L -> "the quick brown fox sat and jumps over the lazy dog",
      // case/punctuation folding: tokenizer lowercases and strips
      13L -> "The QUICK, brown FOX jumps!!!")
    val out = Decontaminate.flagged(corpus, bench, "id", "text", n = 4)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(10L, 12L, 13L))
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(byId(10L) == 1L, s"10: ${out.toSeq}") // "quick brown fox jumps"
    // "the quick brown fox", "jumps over the lazy", "over the lazy dog"
    assert(byId(12L) == 3L, s"12: ${out.toSeq}")
    // folding: "the quick brown fox", "quick brown fox jumps"
    assert(byId(13L) == 2L, s"13: ${out.toSeq}")
  }

  test("no false hits on disjoint vocabulary") {
    val bench = df(1L -> "alpha beta gamma delta epsilon zeta")
    val corpus = df(10L -> "one two three four five six seven",
                    11L -> "eight nine ten eleven twelve")
    assert(Decontaminate.flagged(corpus, bench, "id", "text", n = 4).count() == 0L)
  }

  test("docs shorter than n tokens produce no grams and are never flagged") {
    val bench = df(1L -> "a b c d e")
    val corpus = df(10L -> "a b c") // 3 tokens < n=4
    assert(Decontaminate.flagged(corpus, bench, "id", "text", n = 4).count() == 0L)
  }

  test("clean() is exactly corpus minus flagged, by id") {
    val bench = df(1L -> "the quick brown fox jumps over the lazy dog")
    val corpus = df(
      10L -> "a quick brown fox jumps high",
      11L -> "completely unrelated text about nothing shared here",
      12L -> "the quick brown fox sat")
    val flaggedIds = Decontaminate.flagged(corpus, bench, "id", "text", n = 4)
      .select("id").as[Long].collect().toSet
    val cleanIds = Decontaminate.clean(corpus, bench, "id", "text", n = 4)
      .select("id").as[Long].collect().toSet
    assert(cleanIds == Set(10L, 11L, 12L) -- flaggedIds)
    assert((cleanIds & flaggedIds).isEmpty)
  }

  test("broadcast and shuffle-join paths agree") {
    val bench = df(1L -> "the quick brown fox jumps over the lazy dog",
                   2L -> "pack my box with five dozen liquor jugs")
    val corpus = df(
      10L -> "a quick brown fox jumps high over the lazy dog today",
      11L -> "my box with five dozen eggs",
      12L -> "nothing in common at all")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(canon(Decontaminate.flagged(corpus, bench, "id", "text", 4, broadcastBench = true)) ==
           canon(Decontaminate.flagged(corpus, bench, "id", "text", 4, broadcastBench = false)))
  }
}
