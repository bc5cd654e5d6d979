package graft.sources

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL transcript ingestion — the arrival format transcripts actually
  * come in before anything lands in Iceberg/parquet (one JSON object per
  * line, the BASELINE.json input_hint schema).
  *
  * Scale discipline:
  *  - the schema is EXPLICIT, never inferred: schema inference is a full
  *    extra scan of the input (ruinous at 100 TB) and a correctness
  *    hazard (a batch whose first files miss the `tool` field would
  *    silently drop the column for every row);
  *  - malformed lines are QUARANTINED, not dropped or silently nulled:
  *    at production volume some bad lines are a certainty, and losing
  *    them without a trace breaks the per-row lineage accounting the
  *    north rule requires.
  *
  * Shape: `text` source + `from_json` with a corrupt-record field inside
  * the struct, NOT the JSON file source's PERMISSIVE mode. The file
  * source refuses plans whose scan references only its corrupt column
  * (queryFromRawFilesIncludeCorruptRecordColumnError; the documented
  * cache() workaround is wrong at ingest scale), and with partial-result
  * parsing a half-parseable line carries BOTH data values and the
  * corrupt marker — `from_json` keeps the raw line and the parse result
  * side by side, so the clean/quarantine split is total and exact: a row
  * goes to [[turns]] iff its corrupt field is null, to [[quarantine]]
  * otherwise, never to both, never to neither (property-tested). */
object TranscriptSource {

  val CorruptCol = "_corrupt_record"

  /** input_hint schema + the in-struct quarantine field. */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType),
    StructField(CorruptCol, StringType)))

  /** Shared parse shape over a one-column `value` frame (batch text
    * source and streaming file source plan identically through it). */
  private def parsed(lines: DataFrame): DataFrame =
    lines
      .where(length(trim(col("value"))) > 0) // JSONL: blank lines are not records
      .select(col("value").as("raw_line"),
              from_json(col("value"), schema,
                Map("mode" -> "PERMISSIVE",
                    "columnNameOfCorruptRecord" -> CorruptCol)).as("t"))

  /** Every input line as (raw_line, parsed struct) — parsed carries the
    * data fields plus the corrupt marker for malformed lines. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    parsed(spark.read.text(path))

  /** Streaming twin: watch `path` for arriving JSONL files (the
    * ingestion-directory deployment shape — new transcript dumps appear,
    * each micro-batch is whatever files landed since the last trigger).
    * Same parse, same [[turns]]/[[quarantine]] split; compose with
    * [[graft.streaming.StreamingMaintain]] for continuously-maintained
    * clusters, with the caveat that a conversation's turns should arrive
    * within one file batch (the conversation-complete increment
    * contract). `maxFilesPerTrigger` etc. pass through `options`. */
  def readJsonlStream(spark: SparkSession, path: String,
                      options: Map[String, String] = Map.empty): DataFrame =
    parsed(spark.readStream.options(options).text(path))

  // A line is CLEAN iff its parse carries no corrupt marker AND produced
  // a usable record: the JSON literal `null` parses "successfully" to a
  // null struct (no corrupt marker!), and a syntactically-valid object
  // with no conv_id is un-ingestable (every downstream key and lineage
  // row needs it). Both go to quarantine — keeping the clean/quarantine
  // split total and exact (round-4 ADVICE: the null-literal line used to
  // land in turns() as an all-null Turn).
  private def isClean = col(s"t.$CorruptCol").isNull &&
    col("t").isNotNull && col("t.conv_id").isNotNull

  /** Clean typed turns: rows whose line parsed completely to a usable
    * record. */
  def turns(raw: DataFrame): Dataset[Turn] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.where(isClean)
      .select(col("t.conv_id"), col("t.turn_idx"), col("t.role"),
              col("t.text"), col("t.tool"), col("t.ts"))
      .as[Turn]
  }

  /** Dead-letter rows: the verbatim line of every malformed or unusable
    * record (plus whatever fields partial parsing could still extract,
    * for triage), ready for a quarantine table (audited, re-ingestable).
    * Exact complement of [[turns]] over the input lines. */
  def quarantine(raw: DataFrame): DataFrame =
    raw.where(!isClean)
      .select(col("raw_line"), col("t.conv_id").as("parsed_conv_id"))
}
