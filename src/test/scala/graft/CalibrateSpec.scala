package graft

import graft.operators.{Calibrate, Scoring}
import graft.sources.TranscriptGen

/** Calibration lifecycle gate (round-3 verdict task 4): a broken scoring
  * config fails the F1 gate; re-calibrating on the labeled fixtures and
  * loading the persisted artifact restores it. */
class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  val cfg = TranscriptGen.GenConfig(nEntities = 150, nConvs = 300)
  lazy val turns = TranscriptGen.transcripts(spark, cfg).cache()
  lazy val gold = TranscriptGen.goldMentions(spark, cfg).cache()
  lazy val dict = TranscriptGen.dict(cfg)
  lazy val vecs = TranscriptGen.entityVectors(cfg, graft.operators.MentionDetect.CtxDim)
  lazy val ms = {
    val sc = spark.sparkContext
    Pipeline.allMentions(turns, sc.broadcast(dict), sc.broadcast(vecs)).cache()
  }
  lazy val labeled = Calibrate.labeledFeaturesFromGold(ms, gold).cache()

  // a config no human would ship: every corroborating weight zeroed and a
  // threshold no reachable score clears (max score = 0.1 < 0.9) — zero
  // edges, all-singleton clusters
  val broken = Scoring.ScoreConfig(
    wJaroWinkler = 0.0, wLevRatio = 0.0, wCosine = 0.0,
    wPriorOverlap = 0.0, wResolvedAgree = 0.1, threshold = 0.9)

  test("threshold-only sweep (rounds=0) on default weights passes the gate") {
    val r = Calibrate.fit(labeled, Scoring.ScoreConfig(), rounds = 0)
    info(f"pairs=${r.pairs} pos=${r.positives} thr=${r.cfg.threshold}%.4f " +
         f"pairF1=${r.f1}%.4f holdoutF1=${r.holdoutF1}%.4f")
    assert(r.pairs > 0 && r.positives > 0 && r.positives < r.pairs)
    assert(r.f1 >= 0.99)
    // the HOLDOUT gate: pairs the sweep never saw
    assert(r.holdoutF1 >= 0.99, s"holdout pair F1 ${r.holdoutF1}")
    val gate = Pipeline.pairwiseF1(
      Pipeline.run(turns, dict, vecs, Pipeline.Config(score = r.cfg)), gold, dict)
    assert(gate.f1 >= 0.99, s"cluster-level F1 ${gate.f1} with swept threshold")
  }

  test("broken config fails the gate; re-calibration + artifact restores it") {
    val badF1 = Pipeline.pairwiseF1(
      Pipeline.run(turns, dict, vecs, Pipeline.Config(score = broken)), gold, dict)
    assert(badF1.f1 < 0.99, s"broken config unexpectedly scored ${badF1.f1}")

    val dir = java.nio.file.Files.createTempDirectory("graft-cal").toString
    val res = Calibrate.fitAndSave(labeled, s"$dir/score.json", broken)
    info(f"fitted from broken start: pairF1=${res.f1}%.4f " +
         f"holdoutF1=${res.holdoutF1}%.4f cfg=${res.cfg}")
    assert(res.f1 >= 0.99, s"fit only reached pair F1 ${res.f1}")
    assert(res.holdoutF1 >= 0.99, s"holdout pair F1 ${res.holdoutF1}")

    val fitted = Scoring.loadConfig(s"$dir/score.json")
    assert(fitted == res.cfg, "artifact round-trip changed the fitted config")
    val gate = Pipeline.pairwiseF1(
      Pipeline.run(turns, dict, vecs, Pipeline.Config(score = fitted)), gold, dict)
    info(f"restored gate: tp=${gate.tp} fp=${gate.fp} fn=${gate.fn} F1=${gate.f1}%.4f")
    assert(gate.f1 >= 0.99, s"cluster-level F1 ${gate.f1} with fitted artifact")
  }

  test("fit is deterministic") {
    val a = Calibrate.fit(labeled, broken)
    val b = Calibrate.fit(labeled, broken)
    assert(a.cfg == b.cfg && a.f1 == b.f1)
    assert(a.holdoutF1 == b.holdoutF1 ||
           (a.holdoutF1.isNaN && b.holdoutF1.isNaN))
  }

  test("the fit/holdout split is real: disjoint, total, and selection never reads holdout") {
    // holdoutFrac = 0 reproduces fit-on-all (NaN holdout); a nonzero
    // fraction must leave pairs out
    val all = Calibrate.fit(labeled, Scoring.ScoreConfig(), rounds = 0,
                            holdoutFrac = 0.0)
    assert(all.holdoutF1.isNaN)
    val split = Calibrate.fit(labeled, Scoring.ScoreConfig(), rounds = 0,
                              holdoutFrac = 0.2)
    val total = labeled.count()
    assert(split.pairs < total, s"fit split ${split.pairs} should be < $total")
    assert(!split.holdoutF1.isNaN)
  }
}
