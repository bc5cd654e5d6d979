package graft

import graft.model.Turn
import graft.sources.TranscriptSource
import org.apache.spark.sql.functions._

/** JSONL ingestion gate: explicit-schema parse fidelity (round-trip
  * through JSONL preserves every Turn field), corrupt-line quarantine
  * (no row lost, no row silently nulled), and missing-optional-field
  * tolerance. */
class TranscriptSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString

  val goodTurns = Seq(
    Turn("c1", 0, "user", "hello bakozu corp", null,
         java.sql.Timestamp.valueOf("2024-03-01 10:00:00")),
    Turn("c1", 1, "assistant", "hi — zvq & ünïcode", "search",
         java.sql.Timestamp.valueOf("2024-03-01 10:00:05")),
    Turn("c2", 0, "tool", "{\"nested\": \"json in text\"}", null,
         java.sql.Timestamp.valueOf("2024-03-02 00:00:00")))

  test("JSONL round-trip preserves every Turn field (incl. nulls, unicode, nested braces)") {
    val dir = tmp("jsonl-rt")
    goodTurns.toDS().write.mode("overwrite").json(dir)
    val back = TranscriptSource.turns(TranscriptSource.readJsonl(spark, dir))
      .collect().sortBy(t => (t.conv_id, t.turn_idx))
    assert(back.toSeq == goodTurns.sortBy(t => (t.conv_id, t.turn_idx)))
  }

  test("malformed lines land in quarantine verbatim; clean rows are unaffected") {
    val dir = tmp("jsonl-q")
    goodTurns.toDS().write.mode("overwrite").json(dir)
    // append a file with garbage lines among valid ones
    val extra = new java.io.File(dir, "part-extra.json")
    val w = new java.io.PrintWriter(extra, "UTF-8")
    w.println("""{"conv_id":"c3","turn_idx":0,"role":"user","text":"ok","tool":null,"ts":"2024-03-03T00:00:00.000Z"}""")
    w.println("""not json at all""")
    w.println("""{"conv_id":"c3","turn_idx": BROKEN}""")
    w.close()
    val raw = TranscriptSource.readJsonl(spark, dir)
    val clean = TranscriptSource.turns(raw)
    val dead = TranscriptSource.quarantine(raw)
      .select("raw_line").as[String].collect()
    assert(clean.count() == goodTurns.size + 1)
    assert(clean.where(col("conv_id") === "c3").count() == 1)
    assert(dead.length == 2)
    assert(dead.contains("not json at all"))
    assert(dead.exists(_.contains("BROKEN")))
    // total + exact split: every non-blank input line is in exactly one side
    assert(clean.count() + dead.length == raw.count())
  }

  test("JSON literal null and conv_id-less objects go to quarantine, not to turns") {
    // `null` is VALID JSON: from_json returns a null struct with a null
    // corrupt marker — without the t.isNotNull guard it became an
    // all-null Turn (round-4 ADVICE). An object missing conv_id is
    // syntactically fine but un-ingestable.
    val dir = tmp("jsonl-null")
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"conv_id":"c1","turn_idx":0,"role":"user","text":"ok","tool":null,"ts":"2024-03-03T00:00:00.000Z"}""")
    w.println("""null""")
    w.println("""{"turn_idx":1,"role":"user","text":"no conv id"}""")
    w.close()
    val raw = TranscriptSource.readJsonl(spark, dir)
    val clean = TranscriptSource.turns(raw).collect()
    val dead = TranscriptSource.quarantine(raw)
      .select("raw_line").as[String].collect()
    assert(clean.map(_.conv_id).toSeq == Seq("c1"))
    assert(clean.forall(_.conv_id != null))
    assert(dead.toSet == Set("null", """{"turn_idx":1,"role":"user","text":"no conv id"}"""))
    // the split stays total and exact
    assert(clean.length + dead.length == raw.count())
  }

  test("missing optional fields parse as null instead of dropping the column") {
    val dir = tmp("jsonl-m")
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"conv_id":"c9","turn_idx":3,"role":"user","text":"no tool no ts"}""")
    w.close()
    val got = TranscriptSource.turns(TranscriptSource.readJsonl(spark, dir)).collect()
    assert(got.length == 1)
    assert(got.head.conv_id == "c9" && got.head.turn_idx == 3)
    assert(got.head.tool == null && got.head.ts == null)
  }
}
