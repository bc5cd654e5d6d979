package graft

import graft.operators.Redact
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("each default class redacts and counts its matches") {
    val rows = Seq(
      (1L, "mail me at alice.smith+x@ex-ample.co.uk today"),
      (2L, "call 415-555-0123 or 415.555.9876"),
      (3L, "ssn is 123-45-6789"),
      (4L, "host 10.0.37.1 and 192.168.0.255"),
      (5L, "nothing sensitive here"),
    ).toDF("id", "text")
    val out = Redact.withRedaction(rows, "text")
      .select("id", "n_email", "n_phone", "n_ssn", "n_ipv4", "redacted")
      .as[(Long, Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 1L, 0L, 0L, 0L, "mail me at <EMAIL> today")))
    assert(out(1) == ((2L, 0L, 2L, 0L, 0L, "call <PHONE> or <PHONE>")))
    assert(out(2) == ((3L, 0L, 0L, 1L, 0L, "ssn is <SSN>")))
    assert(out(3) == ((4L, 0L, 0L, 0L, 2L, "host <IP> and <IP>")))
    assert(out(4) == ((5L, 0L, 0L, 0L, 0L, "nothing sensitive here")))
  }

  test("classes see the previous classes' replacements (no double count)") {
    // the phone class consumes 415-555-0123 BEFORE the ssn class runs;
    // what remains has no 3-2-4 digit group
    val rows = Seq((1L, "415-555-0123")).toDF("id", "text")
    val out = Redact.withRedaction(rows, "text")
      .select("n_phone", "n_ssn", "redacted")
      .as[(Long, Long, String)].head()
    assert(out == ((1L, 0L, "<PHONE>")))
  }

  test("redactObserved reports per-class totals and rows touched via observe") {
    val rows = Seq(
      (1L, "a@b.com and c@d.org"),
      (2L, "ssn 123-45-6789"),
      (3L, "clean"),
    ).toDF("id", "text")
    val (df, obs) = Redact.redactObserved(rows, "text")
    df.write.format("noop").mode("overwrite").save() // the consuming action
    val m = obs.get
    assert(m("total_email") == 2L, m)
    assert(m("total_ssn") == 1L, m)
    assert(m("total_phone") == 0L, m)
    assert(m("rows_touched") == 2L, m)
    assert(m("rows_total") == 3L, m)
  }
}
