package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  val df = Seq(
    (Some(1L), Some("en"), 10L),
    (Some(2L), None, 20L),
    (Some(2L), Some("de"), 30L),
    (None, Some("en"), 40L)
  ).toDF("id", "lang", "n")

  test("exotic column names (quotes, backticks, spaces) survive the unpivot") {
    val weird = Seq((1L, 2L), (3L, 4L)).toDF("user's score", "a`b c")
    val p = Profile.profile(weird, Seq("user's score", "a`b c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("user's score", "a`b c"))
    assert(p("user's score").getLong(1) == 2L)
    assert(p("a`b c").getString(5) == "4")
  }

  test("one pass computes per-column nulls, distincts, ranges, and numeric center") {
    val p = Profile.profile(df, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "lang", "n"))

    val id = p("id")
    assert(id.getLong(1) == 4L)        // n: table rows, same for every column
    assert(id.getLong(2) == 1L)        // n_null
    assert(id.getLong(3) == 2L)        // n_distinct (nulls not counted)
    assert(id.getString(4) == "1" && id.getString(5) == "2")
    assert(id.getDouble(6) == 1.666667) // mean over non-null, rounded to 6
    assert(id.getDouble(7) == 2.0)     // p50 of (1,2,2)

    val lang = p("lang")
    assert(lang.getLong(2) == 1L && lang.getLong(3) == 2L)
    assert(lang.getString(4) == "de" && lang.getString(5) == "en")
    assert(lang.isNullAt(6) && lang.isNullAt(7)) // non-numeric: no mean/p50

    val n = p("n")
    assert(n.getLong(2) == 0L && n.getLong(3) == 4L)
    assert(n.getDouble(7) == 25.0) // exact interpolated median of 10,20,30,40
  }
}
