package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** PII / pattern redaction with per-class lineage counts — the scrub pass
  * a transcript corpus goes through before training (round-4 verdict
  * "What's missing" #2), under the same lineage discipline as
  * TranscriptSource's quarantine split: nothing is silently dropped, and
  * how many rows/matches each class touched is first-class output.
  *
  * Shape: map-only column math — a fixed chain of regexp_replace calls
  * with per-class match counts taken on the text AS EACH CLASS SEES IT
  * (i.e. after the previous classes' replacements, so classes never
  * double-count each other's output). Everything stays inside whole-stage
  * codegen; no UDFs, no shuffle. The regex family is deliberately
  * conservative syntax (explicit char classes, bounded quantifiers,
  * `\b` anchors) that Java regex and RE2/DuckDB interpret identically —
  * q51 oracles the full chain, counts and redacted text both, against
  * DuckDB `regexp_replace(..., 'g')`.
  *
  * At 100 TB: per-class totals should ride the write as `observe`
  * counters ([[redactObserved]]) rather than a second aggregation pass —
  * the counts arrive with the job, not from re-scanning the output.
  */
object Redact {

  /** One redaction class: name (column suffix), regex, replacement. */
  case class PiiClass(name: String, pattern: String, replacement: String)

  /** Default classes, applied in order. */
  val Defaults: Seq[PiiClass] = Seq(
    PiiClass("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiClass("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    PiiClass("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    PiiClass("ipv4",  "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
  )

  /** `df` plus `redacted` (the scrubbed text) and one `n_<class>` BIGINT
    * match count per class. Original text column is preserved untouched —
    * callers drop it when writing the clean table. */
  def withRedaction(df: DataFrame, textCol: String,
                    classes: Seq[PiiClass] = Defaults): DataFrame = {
    val (finalText, counts) =
      classes.foldLeft((col(textCol), Seq.empty[org.apache.spark.sql.Column])) {
        case ((t, cs), c) =>
          val n = size(regexp_extract_all(t, lit(c.pattern), lit(0)))
            .cast("bigint").as(s"n_${c.name}")
          (regexp_replace(t, c.pattern, c.replacement), cs :+ n)
      }
    df.withColumns(
      (classes.map(c => s"n_${c.name}") :+ "redacted")
        .zip(counts :+ finalText.as("redacted")).toMap)
  }

  /** [[withRedaction]] plus an [[Observation]] carrying per-class total
    * match counts and rows-touched — materialized by whatever action
    * consumes the result (the write), no second pass. Read
    * `obs.get` AFTER the action completes. */
  def redactObserved(df: DataFrame, textCol: String,
                     classes: Seq[PiiClass] = Defaults): (DataFrame, Observation) = {
    val out = withRedaction(df, textCol, classes)
    val obs = Observation("redact")
    val metrics =
      classes.map(c => sum(col(s"n_${c.name}")).as(s"total_${c.name}")) :+
      sum(when(classes.map(c => col(s"n_${c.name}") > 0).reduce(_ || _), 1L)
            .otherwise(0L)).as("rows_touched") :+
      count(lit(1)).as("rows_total")
    (out.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
