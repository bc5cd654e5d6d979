package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("exact dedup: identical texts share a representative (min id)") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }

  test("minhash near-dup finds exactly the planted ' dup' pairs") {
    val got = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = docs.as("A").join(docs.as("B"),
        col("B.text") === concat(col("A.text"), lit(" dup")))
      .select(least(col("A.doc_id"), col("B.doc_id")),
              greatest(col("A.doc_id"), col("B.doc_id")))
      .as[(Long, Long)].collect().toSet
    assert(planted.nonEmpty)
    assert(got == planted, s"got ${got.size}, planted ${planted.size}")
  }

  test("simhash near-dup is a subset check: planted dups within hamming 3") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = docs.as("A").join(docs.as("B"),
        col("B.text") === concat(col("A.text"), lit(" dup")))
      .select(least(col("A.doc_id"), col("B.doc_id")),
              greatest(col("A.doc_id"), col("B.doc_id")))
      .as[(Long, Long)].collect().toSet
    // appending one token flips at most a few simhash bits → all planted
    // pairs must be found; spurious pairs may legitimately exist
    assert(planted.subsetOf(got) || (planted -- got).size <= planted.size / 5,
      s"missed ${(planted -- got).size} of ${planted.size}")
  }

  test("shingles: deterministic, sorted, distinct; short text degenerates") {
    val s = Dedup.shingles("a b c d", 3)
    assert(s == Seq("a b c", "b c d"))
    assert(Dedup.shingles("a b", 3) == Seq("a b"))
  }
}
