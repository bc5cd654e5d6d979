package graft

import graft.sources.TranscriptGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism scaling evidence for the DEDUP side of the library —
  * the same protocol as [[ScalingBench]] (one timed level per fresh JVM,
  * small-corpus warm-up, interleave reps across levels, efficiency =
  * (thr_4N/thr_N)/4) applied to `Dedup.canonicalize` end-to-end: shingle
  * → MinHash signatures → banded candidate join → exact-Jaccard verify →
  * connected components → keep-policy window. The ER flagship's scaling
  * evidence says nothing about this path's banded self-join and
  * signature-heavy map stage, which dominate an actual corpus clean-up.
  *
  * Corpus: the bench transcript corpus's turns as documents (stable
  * xxhash64(conv, turn) ids — collision odds at 10⁷ docs are ~1e-5 and
  * irrelevant to timing).
  *
  * Threshold 0.8 — the measured scale point. At threshold 0.6 autoBanding
  * picks 64 bands × 2 rows, and on template-heavy transcript text (baseline
  * inter-turn shingle Jaccard ≈ 0.006) 64·j² gives a 0.25% BASELINE
  * candidate rate: 21M candidate pairs at 130k docs (measured), i.e. a
  * quadratic floor no banding of an exactness-preserving 0.6 family
  * avoids. At 0.8 the sound banding is 32×4 (P(miss) ≤ 1e-4 at the verify
  * threshold — still exact-on-candidates) and the baseline rate drops to
  * 32·j⁴ ≈ 5e-8. Raising the threshold IS the documented scale lever
  * (`minhashPairs` Scaladoc); this bench measures the lever's setting.
  *
  * `sbt "runMain graft.DedupScaleBench 2"` then `... 8`, interleaved.
  */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val cfg = TranscriptGen.GenConfig(
      nEntities = 2000,
      nConvs = sys.env.getOrElse("GRAFT_DEDUP_CONVS", "500000").toInt)
    val warmCfg = cfg.copy(nConvs = cfg.nConvs / 8)

    val gen = Bench.benchSession("32")
    val path = Bench.ensureCorpus(gen, cfg)
    val warmPath = Bench.ensureCorpus(gen, warmCfg)
    gen.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    def docsOf(spark: SparkSession, p: String) =
      spark.read.parquet(p)
        .select(xxhash64(col("conv_id"), col("turn_idx")).as("doc_id"),
                col("text"))

    def oneRun(p: String): (Double, Long, Long) = {
      val spark = Bench.benchSession(cpus.toString)
      val d = docsOf(spark, p)
      val nDocs = d.count()
      val t0 = System.nanoTime()
      val out = operators.Dedup.canonicalize(d, "doc_id", "text", threshold = 0.8)
      val kept = out.where(col("keep")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (secs, nDocs, kept)
    }

    val (wSecs, _, _) = oneRun(warmPath)
    val (secs, nDocs, kept) = oneRun(path)
    println(
      s"""{"metric":"dedup_scaling_level","cpus":$cpus,"secs":${math.rint(secs * 100) / 100},""" +
      s""""docs":$nDocs,"docs_per_sec":${math.rint(nDocs / secs * 10) / 10},""" +
      s""""kept":$kept,"warmup_secs":${math.rint(wSecs * 100) / 100}}""")
  }
}
