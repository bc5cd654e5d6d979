package graft

import graft.operators.{Mixture, Sampling}
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("fractions: frac = min(1, budget/total_tokens), quantized to the 16^6 grid") {
    val budget = 1000L
    val fr = Mixture.fractions(docs, "source", "text", Map.empty, budget)
      .select("cls", "total_tokens", "frac", "cells")
      .as[(String, Long, Double, Int)].collect()
    assert(fr.nonEmpty)
    fr.foreach { case (_, total, frac, cells) =>
      assert(math.abs(frac - math.min(1.0, budget.toDouble / total)) < 1e-12)
      assert(cells == math.round(frac * Mixture.CellsTotal).toInt)
    }
    assert(fr.exists(_._3 < 1.0), "fixture must force real down-sampling")
  }

  test("materialize == independent per-class hashSampleAt replay") {
    val budget = 1000L
    val got = Mixture.materialize(docs, "doc_id", "source", "text", Map.empty, budget)
      .select("doc_id").as[Long].collect().toSet
    val fr = Mixture.fractions(docs, "source", "text", Map.empty, budget)
      .select("cls", "frac").as[(String, Double)].collect().toMap
    val expect = fr.keys.flatMap { cls =>
      docs.where(col("source") === cls)
        .where(Sampling.hashSampleAt(col("doc_id"), fr(cls), Mixture.HexChars))
        .select("doc_id").as[Long].collect()
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < docs.count())
  }

  test("sub-1/512 fractions never quantize a budgeted class to zero cells") {
    val fr = Mixture.fractions(docs, "source", "text", Map.empty, 2L)
      .select("frac", "cells").as[(Double, Int)].collect()
    assert(fr.nonEmpty)
    fr.foreach { case (f, c) =>
      assert(f < 1.0 / 512, s"fixture must force a sub-1/512 fraction, got $f")
      assert(c > 0, s"positive budget quantized to zero cells at frac=$f")
    }
  }

  test("null-class rows survive (null-safe class join)") {
    val df = Seq((1L, Option("s1"), "alpha beta gamma"),
                 (2L, Option.empty[String], "delta epsilon zeta"))
      .toDF("doc_id", "source", "text")
    val out = Mixture.materialize(df, "doc_id", "source", "text", Map.empty)
    assert(out.count() == 2, "a whole-corpus budget must keep the null class too")
  }

  test("raising one class's budget only adds rows, and only of that class") {
    val c0 = docs.select("source").as[String].distinct().collect().min
    val low = Mixture.materialize(docs, "doc_id", "source", "text", Map(c0 -> 500L), 800L)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val high = Mixture.materialize(docs, "doc_id", "source", "text", Map(c0 -> 2000L), 800L)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(low.subsetOf(high), "raising a budget must never drop a picked row")
    assert((high -- low).forall(_._2 == c0), "other classes' picks are untouched")
  }

  test("budget at or above total keeps the class whole") {
    val n = Mixture.materialize(docs, "doc_id", "source", "text", Map.empty).count()
    assert(n == docs.count())
  }
}
