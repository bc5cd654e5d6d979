package graft

import graft.functions.MinHash
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  lazy val docTexts: Array[(Long, String)] =
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()

  test("exact dedup: identical texts share a representative (min id)") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }

  // The operator's contract is exactness vs brute force (the LSH candidate
  // filter must not lose pairs at the verify threshold), NOT recovery of a
  // planted edit set — transitive true near-dups beyond the planted pairs
  // are correct output (round-1 verdict: the old planted-set expectation
  // was the bug, not the operator).
  test("minhash near-dup equals brute-force exact Jaccard at the threshold") {
    val threshold = 0.6
    val got = Dedup.minhashPairs(docs, "doc_id", "text", threshold = threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val sh = docTexts.map { case (id, t) => id -> Dedup.shingles(t, 3).toSet }
    val exact = (for {
      i <- sh.indices.iterator
      j <- (i + 1) until sh.length
      (ia, sa) = sh(i)
      (ib, sb) = sh(j)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size.toDouble
      uni = sa.size + sb.size - inter
      if uni > 0 && math.rint(inter / uni * 1e4) / 1e4 >= threshold
    } yield (math.min(ia, ib), math.max(ia, ib))).toSet
    assert(exact.nonEmpty, "fixture must contain near-dups")
    assert(got == exact, s"got ${got.size}, exact ${exact.size}; " +
      s"missed=${(exact -- got).size} extra=${(got -- exact).size}")
  }

  test("simhash near-dup equals brute-force Hamming<=3 over exact signatures") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val sigs = docTexts.flatMap { case (id, t) =>
      val toks = graft.functions.TextFns.TokenPattern.r.findAllIn(t.toLowerCase).toSeq
      if (toks.isEmpty) None else Some(id -> MinHash.simHashMd5(toks))
    }
    val exact = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if MinHash.hammingDistance(sigs(i)._2, sigs(j)._2) <= 3
    } yield (math.min(sigs(i)._1, sigs(j)._1), math.max(sigs(i)._1, sigs(j)._1))).toSet
    assert(got == exact, s"got ${got.size}, exact ${exact.size}; " +
      s"missed=${(exact -- got).size} extra=${(got -- exact).size}")
  }

  test("simhash: identical texts always pair at hamming 0") {
    val df = Seq((1L, "alpha beta gamma delta epsilon"),
                 (2L, "alpha beta gamma delta epsilon"),
                 (3L, "totally different words entirely here")).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 0)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash band keys: pigeonhole recall for <=3 flipped bits") {
    val base = 0x0123456789abcdefL
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val flips = rnd.nextInt(4) // 0..3 bit flips
      var other = base
      (1 to flips).foreach(_ => other ^= (1L << rnd.nextInt(64)))
      val ka = MinHash.simhashBandKeys(base).toSet
      val kb = MinHash.simhashBandKeys(other).toSet
      assert((ka & kb).nonEmpty,
        s"no shared band key at hamming ${MinHash.hammingDistance(base, other)}")
    }
  }

  test("shingles: deterministic, sorted, distinct; <n tokens -> empty") {
    val s = Dedup.shingles("a b c d", 3)
    assert(s == Seq("a b c", "b c d"))
    assert(Dedup.shingles("a b", 3).isEmpty)
  }

  test("autoBanding picks a recall-sound row count at the threshold") {
    val (b, r) = Dedup.autoBanding(128, 0.6)
    assert(b * r == 128)
    val p = 1.0 - math.pow(1.0 - math.pow(0.6, r), b)
    assert(p >= 0.9999, s"banding ${b}x$r detects j=0.6 with only $p")
    // higher thresholds afford cheaper (higher-r) bandings
    val (_, r9) = Dedup.autoBanding(128, 0.9)
    assert(r9 > r)
  }
}
