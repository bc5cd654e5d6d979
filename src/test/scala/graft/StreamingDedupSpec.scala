package graft

import graft.operators.Dedup
import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "over the lazy dog"),
    (3L, "the quick brown fox"),  // dup of 1 (same batch in test 2, next batch in test 1)
    (4L, "an entirely new doc"),
    (5L, "over the lazy dog"),    // dup of 2 across batches
    (6L, "the quick brown fox"),  // dup of 1 across batches
    (7L, "last unique document"))

  // (sig, min id) per content hash — Dedup.exact's group definition, with
  // the sig recomputed (exact() emits per-id rows and drops the hash)
  private def batchReps: Map[String, Long] = {
    import org.apache.spark.sql.functions._
    val bySig = docs.toDF("id", "text")
      .select(md5(col("text")).as("sig"), col("id"))
      .groupBy("sig").agg(min("id").as("rep_id"))
      .as[(String, Long)].collect().toMap
    // same groups as Dedup.exact: its distinct rep ids are exactly these
    val exactReps = Dedup.exact(docs.toDF("id", "text"), "id", "text")
      .select("rep_id").distinct().as[Long].collect().toSet
    assert(bySig.values.toSet == exactReps)
    bySig
  }

  private def runStream(name: String, batches: Seq[Seq[(Long, String)]]): Map[String, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.firstSeen(input.toDS().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[(String, Long)].collect().toMap
    } finally q.stop()
  }

  test("cross-batch first-seen equals batch exact-dedup groups (in-order ids)") {
    val got = runStream("sd_split", Seq(docs.take(3), docs.slice(3, 5), docs.drop(5)))
    assert(got == batchReps, s"stream=$got batch=$batchReps")
    assert(got.values.toSet == Set(1L, 2L, 4L, 7L)) // dups 3,5,6 never emitted
  }

  test("single-batch duplicates collapse to the min id; split choice is irrelevant") {
    val oneBatch = runStream("sd_one", Seq(docs))
    val perRow = runStream("sd_row", docs.map(Seq(_)))
    assert(oneBatch == batchReps)
    assert(perRow == batchReps)
  }
}
