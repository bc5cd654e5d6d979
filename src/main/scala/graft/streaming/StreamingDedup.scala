package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — ingestion-time "keep the first copy"
  * over an unbounded append stream: the streaming twin of
  * [[graft.operators.Dedup.exact]]'s hash-groupBy, for pipelines that
  * dedupe documents AS THEY ARRIVE instead of re-scanning the corpus.
  *
  * Shape: md5 the text map-side (only the 32-hex sig and the id cross the
  * shuffle, never the document), groupByKey on the sig (uniform key space
  * — content hashes cannot be hot), `flatMapGroupsWithState` keeping one
  * boolean per distinct hash. A micro-batch's rows for one sig collapse
  * to the min-id row (deterministic under partition/arrival order); rows
  * whose sig is already in state emit nothing.
  *
  * Batch parity: when ids arrive non-decreasing (ingestion order), the
  * emitted (sig, rep_id) rows are exactly `Dedup.exact`'s dedup groups
  * (rep = global min id per sig) no matter how the stream is split into
  * micro-batches — gated in StreamingDedupSpec across splits.
  *
  * State discipline at corpus scale: one entry per DISTINCT document is
  * the dedup index itself — irreducible for forever-dedup; in production
  * back it with the RocksDB state store. When the product tolerates a
  * dedup WINDOW (re-admit after N days), pass ProcessingTimeTimeout +
  * `windowMs`: idle hashes are evicted and state is O(distinct docs per
  * window) instead.
  */
object StreamingDedup {

  /** First-seen (sig, rep_id) rows of an append document stream. */
  def firstSeen(docs: DataFrame, idCol: String, textCol: String,
                timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
                windowMs: Long = 0L): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slim = docs.select(md5(col(textCol)).as("sig"),
                           col(idCol).cast("long").as("id"))
      .as[(String, Long)]
    slim.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (sig: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val isNew = !state.exists
            state.update(true)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(windowMs)
            if (isNew) Iterator.single((sig, rows.map(_._2).min))
            else Iterator.empty
          }
      }
      .toDF("sig", "rep_id").as[(String, Long)]
  }
}
