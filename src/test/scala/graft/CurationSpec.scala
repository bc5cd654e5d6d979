package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // one planted failure per stage, one clean survivor, one PII survivor
  private lazy val corpus = Seq(
    (1L, "s1", "alpha beta gamma delta epsilon zeta"),      // clean -> survives
    (2L, "s1", "alpha beta gamma delta epsilon zeta"),      // exact dup of 1 -> dedup
    (3L, "s1", "contains the quick brown fox jumps here today"), // 3-gram hit -> decontam
    (4L, "s1", "spam spam spam spam spam spam"),            // distinct ratio 1/6 -> quality
    (5L, "s2", "email me at bob@example.com soon please okay"), // survives, redacted
    (6L, "s2", "tiny doc"))                                 // < 5 tokens -> quality
    .toDF("doc_id", "source", "text")

  private lazy val bench = Seq((100L, "b", "the quick brown fox jumps"))
    .toDF("doc_id", "source", "text")

  test("every stage removes exactly its planted failure; PII doc survives scrubbed") {
    val out = Curation.curate(corpus, bench, "doc_id", "source", "text")
      .select("doc_id", "source", "tok_len", "bin_key")
      .as[(Long, String, Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 5L),
      s"expected survivors 1 and 5, got ${out.map(_._1).mkString(",")}")
    assert(out.forall(_._3 >= 1L && out.forall(_._3 <= 128L)))
    // doc 5's tok_len counts the SCRUBBED text (address replaced by <EMAIL>)
    val raw = graft.functions.TextFns.bpeishTokenCount(lit("email me at bob@example.com soon please okay"))
    val scrubbed = graft.functions.TextFns.bpeishTokenCount(lit("email me at <EMAIL> soon please okay"))
    val (rawLen, scrubLen) = spark.range(1).select(raw, scrubbed).as[(Long, Long)].head()
    assert(out.find(_._1 == 5L).get._3 == scrubLen && scrubLen != rawLen)
  }

  test("deterministic under repartitioning") {
    val a = Curation.curate(corpus, bench, "doc_id", "source", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = Curation.curate(corpus.repartition(7), bench.repartition(3),
        "doc_id", "source", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("no bin exceeds the token budget on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Curation.curate(
      docs.where(col("doc_id") % 97 =!= 0), docs.where(col("doc_id") % 97 === 0),
      "doc_id", "source", "text")
    val overs = out.groupBy("bin_key").agg(sum("tok_len").as("s"))
      .where(col("s") > 128).count()
    assert(overs == 0, "a packed bin exceeds maxTokens")
    assert(out.count() > 0)
  }
}
