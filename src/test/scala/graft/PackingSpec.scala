package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // deterministic fake corpus: lengths spread over (0, 200]
  private lazy val docs = spark.range(2000).select(
    col("id"),
    concat_ws(" ", transform(sequence(lit(1), (pmod(col("id") * 37, lit(200)) + 1)),
      _ => lit("tok"))).as("text"))

  private val L = 128

  test("bucketed: every doc in range assigned exactly once, no bin over budget") {
    val out = Packing.packBucketed(docs, "id", "text", maxTokens = L,
                                   granularity = 16, shardHexChars = 1).cache()
    val eligible = docs
      .where(size(split(col("text"), " ")) <= L && length(col("text")) > 0).count()
    assert(out.count() == eligible)
    assert(out.select("id").distinct().count() == out.count())
    val over = out.groupBy("bin_key").agg(sum("tok_len").as("fill"))
      .where(col("fill") > L).count()
    assert(over == 0L, "a bin exceeded the token budget")
  }

  test("bucketed: assignment is a pure function of (id, len) — stable under repartition") {
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val a = canon(Packing.packBucketed(docs, "id", "text", L, 16, 1))
    val b = canon(Packing.packBucketed(docs.repartition(13), "id", "text", L, 16, 1))
    assert(a == b)
  }

  test("bucketed: bins never cross (bucket, shard) and fill respects the band bound") {
    val out = Packing.packBucketed(docs, "id", "text", L, 16, 1)
    // per-bin docs all share the bucket prefix in bin_key by construction;
    // fill >= cap * (bucket-1) * g for FULL bins (cap docs)
    val bad = out
      .withColumn("bucket", regexp_extract(col("bin_key"), "^b(\\d+):", 1).cast("long"))
      .groupBy("bin_key", "bucket")
      .agg(count(lit(1)).as("n"), sum("tok_len").as("fill"))
      .withColumn("cap", greatest(floor(lit(L.toDouble) / (col("bucket") * 16)), lit(1.0)).cast("long"))
      .where(col("n") === col("cap") &&
             col("fill") < col("cap") * (col("bucket") - 1) * 16)
      .count()
    assert(bad == 0L, "a full bin fell below the band fill bound")
  }

  test("greedy FFD: budget respected, total coverage, deterministic, few slack bins") {
    val lens = docs.select(col("id"),
      size(split(col("text"), " ")).cast("bigint").as("len"))
    val out = Packing.packGreedy(lens, "id", "len", L, numPartitions = 8).cache()
    val eligible = lens.where(col("len") >= 1 && col("len") <= L).count()
    assert(out.count() == eligible)
    val fills = out.groupBy("bin_key").agg(sum("len").as("fill"))
    assert(fills.where(col("fill") > L).count() == 0L)
    // FFD property: at most one bin at most half-full per partition
    val slack = fills.where(col("fill") <= L / 2).count()
    assert(slack <= 8L, s"$slack half-empty bins for 8 partitions")
    // determinism across runs at the same partition count
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(canon(out) ==
           canon(Packing.packGreedy(lens.repartition(5), "id", "len", L, 8)))
  }

  test("greedy packs tighter than bucketed on the same corpus") {
    val lens = docs.select(col("id"),
      size(split(col("text"), " ")).cast("bigint").as("len"))
    val nGreedy = Packing.packGreedy(lens, "id", "len", L, 8)
      .select("bin_key").distinct().count()
    val nBucketed = Packing.packBucketed(docs, "id", "text", L, 16, 0)
      .select("bin_key").distinct().count()
    info(s"bins: greedy=$nGreedy bucketed=$nBucketed")
    assert(nGreedy <= nBucketed)
  }
}
