package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def keys = spark.range(10000).toDF("id")

  test("splitLabel assigns every row exactly one label with ~right fractions") {
    val parts = Seq("train" -> 0.75, "valid" -> 0.125, "test" -> 0.125)
    val counts = keys
      .select(Sampling.splitLabel(col("id"), parts).as("split"))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts.values.sum == 10000L) // total: no row dropped or doubled
    // md5 cells are uniform; 10k keys over 256 cells → few-percent tolerance
    assert(math.abs(counts("train") / 10000.0 - 0.75) < 0.03, counts)
    assert(math.abs(counts("valid") / 10000.0 - 0.125) < 0.03, counts)
  }

  test("assignment is a pure function of the key: stable under repartitioning") {
    val parts = Seq("a" -> 0.5, "b" -> 0.5)
    def labels(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), Sampling.splitLabel(col("id"), parts).as("s"))
      .as[(Long, String)].collect().toMap
    assert(labels(keys) == labels(keys.repartition(13)))
  }

  test("different seeds decorrelate; same seed reproduces") {
    val s1 = keys.where(Sampling.hashSample(col("id"), 0.5, "seedA"))
      .as[Long].collect().toSet
    val s1b = keys.where(Sampling.hashSample(col("id"), 0.5, "seedA"))
      .as[Long].collect().toSet
    val s2 = keys.where(Sampling.hashSample(col("id"), 0.5, "seedB"))
      .as[Long].collect().toSet
    assert(s1 == s1b)
    assert(s1 != s2)
    // independence: overlap of two 50% samples ≈ 25% of keys
    val overlap = (s1 & s2).size / 10000.0
    assert(overlap > 0.15 && overlap < 0.35, overlap)
  }

  test("smaller fractions nest inside larger ones") {
    def sample(f: Double) = keys.where(Sampling.hashSample(col("id"), f))
      .as[Long].collect().toSet
    val s10 = sample(0.1); val s50 = sample(0.5); val s100 = sample(1.0)
    assert(s10.subsetOf(s50) && s50.subsetOf(s100))
    assert(s100.size == 10000)
    assert(sample(0.0).isEmpty)
  }

  test("degenerate single-part split labels everything") {
    val labels = keys.select(Sampling.splitLabel(col("id"), Seq("all" -> 1.0)).as("s"))
      .select("s").distinct().as[String].collect().toSeq
    assert(labels == Seq("all"))
  }

  test("stratified sample applies per-class fractions; unknown classes keep default") {
    val classed = keys.withColumn("cls",
      when(col("id") % 3 === 0, "en").when(col("id") % 3 === 1, "zh").otherwise("de"))
    val kept = classed
      .where(Sampling.hashSampleStratified(col("id"), col("cls"),
        Map("en" -> 0.5, "zh" -> 0.25), default = 1.0))
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    val totals = classed.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(kept("de") == totals("de")) // default 1.0 keeps everything
    assert(math.abs(kept("en").toDouble / totals("en") - 0.5) < 0.05, kept)
    assert(math.abs(kept("zh").toDouble / totals("zh") - 0.25) < 0.05, kept)
  }

  test("hashSampleAt resolves fractions the 2-hex cell floor quantizes to zero") {
    val wide = spark.range(100000).select(col("id").cast("string").as("k"))
    // 2-hex granularity: frac 1e-3 rounds to zero cells -> empty sample
    assert(wide.where(Sampling.hashSample(col("k"), 0.001)).count() == 0L)
    val fine = wide.where(Sampling.hashSampleAt(col("k"), 0.001, 6)).count()
    assert(fine > 50 && fine < 200, s"expected ~100 of 100k, got $fine")
    // nesting at the same granularity
    val small = wide.where(Sampling.hashSampleAt(col("k"), 0.001, 6))
    val large = wide.where(Sampling.hashSampleAt(col("k"), 0.01, 6))
    assert(small.join(large, Seq("k"), "left_anti").count() == 0L)
    // full keep
    assert(wide.where(Sampling.hashSampleAt(col("k"), 1.0, 6)).count() == 100000L)
  }

  test("stratified picks for a class equal the flat sample at that fraction") {
    val classed = keys.withColumn("cls", when(col("id") % 2 === 0, "a").otherwise("b"))
    val strat = classed
      .where(Sampling.hashSampleStratified(col("id"), col("cls"), Map("a" -> 0.3), 1.0))
      .where(col("cls") === "a").select("id").as[Long].collect().toSet
    val flat = classed.where(col("cls") === "a")
      .where(Sampling.hashSample(col("id"), 0.3))
      .select("id").as[Long].collect().toSet
    assert(strat == flat) // same cells ⇒ rebalancing one class never moves another's picks
  }
}
