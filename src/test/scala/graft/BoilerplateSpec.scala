package graft

import graft.operators.Boilerplate

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // "thanks for contacting" is a 3-token template with varying slots across
  // 3 conversations; "let me check" appears in only 2; unique turns fill in.
  val turns = Seq(
    ("c1", 0L, "Thanks for contacting Acme support today"),
    ("c1", 1L, "my printer is on fire"),
    ("c2", 0L, "thanks for CONTACTING Beta helpdesk"),
    ("c2", 1L, "let me check the logs"),
    ("c3", 0L, "Thanks, for contacting Gamma desk!"),
    ("c3", 1L, "let me check upstream"),
    ("c3", 2L, "thanks for contacting again"), // same conv: counts 1 conv, 2 turns via c3
    ("c4", 0L, "completely original content here")
  ).toDF("conv_id", "turn_idx", "text")

  test("catalog finds templates by distinct-conversation support, not turn count") {
    val cat = Boilerplate.catalog(turns, "text", "conv_id", keyTokens = 3, minConvs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // normalization folds case/punct; c3 contributes 2 turns but 1 conv
    assert(cat.toSeq == Seq(("thanks for contacting", 3L, 4L)))
  }

  test("minConvs boundary: support 2 stays when threshold is 3, goes at 2") {
    val at3 = Boilerplate.catalog(turns, "text", "conv_id", 3, 3)
      .select("prefix").as[String].collect().toSet
    assert(!at3.contains("let me check"))
    val at2 = Boilerplate.catalog(turns, "text", "conv_id", 3, 2)
      .select("prefix").as[String].collect().toSet
    assert(at2 == Set("thanks for contacting", "let me check"))
  }

  test("clean drops exactly the catalog-keyed turns and preserves all columns") {
    val cleaned = Boilerplate.clean(turns, "text", "conv_id", 3, 3)
    assert(cleaned.columns.toSeq == Seq("conv_id", "turn_idx", "text"))
    val kept = cleaned.select("conv_id", "turn_idx").as[(String, Long)].collect().toSet
    assert(kept == Set(("c1", 1L), ("c2", 1L), ("c3", 1L), ("c4", 0L)))
    // partition: clean + removed == input
    assert(cleaned.count() + 4 == turns.count())
  }

  test("short and empty turns key on what they have") {
    val t = Seq(("a", 0L, "hi"), ("b", 0L, "hi"), ("c", 0L, "HI!"),
                ("a", 1L, ""), ("b", 1L, "--")).toDF("conv_id", "turn_idx", "text")
    val cat = Boilerplate.catalog(t, "text", "conv_id", 3, 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cat("hi") == 3L)  // sub-keyTokens text keys on its only token
    assert(cat("") == 2L)    // empty and punct-only both normalize to ""
  }
}
