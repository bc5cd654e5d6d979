package graft.operators

import graft.model.{Ids, Mention}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calibration of the scoring artifact on labeled golden pairs — the
  * "train" half of the fitted-model lifecycle (SURVEY.md D6; the analogue
  * of REL's train → evaluate → persist cycle, E3). `Scoring.saveConfig` /
  * `loadConfig` persist the fitted state; this operator PRODUCES it, so a
  * production re-calibration is a job run, not a human editing JSON.
  *
  * Model class is fixed (the linear feature blend + threshold the
  * north_rule prescribes in place of REL's NN ranker), so fitting is
  * threshold selection + coordinate search over the five feature weights,
  * both maximizing PAIR-level F1 on the labeled candidate-pair set — the
  * same "labeled pairs sharing a blocking key" universe as the
  * BASELINE.json metric (cluster-level F1 is then verified downstream by
  * the caller / CalibrateSpec, since transitivity can only merge clusters
  * the edge decisions imply).
  *
  * Scale shape: features are computed ONCE on the cluster and persisted
  * slim (5 doubles + 1 label per pair — vectors and candidate lists never
  * survive past `Scoring.withFeatures`). Every fit step evaluates a whole
  * candidate grid in ONE distributed pass: pairs × grid-points rows, a
  * map-side groupBy onto (grid, score) cells, then a per-grid-point
  * cumulative sweep over DISTINCT scores that reads the optimal threshold
  * and its F1 off a single window pass. Only |grid| result rows reach the
  * driver. A labeled/golden set is curated data — orders of magnitude
  * smaller than the corpus — and nothing here touches unlabeled rows, so
  * the per-grid-point window partitions (≤ distinct score values) are
  * bounded by the labeled-set size, not the corpus.
  */
object Calibrate {

  /** Labeled candidate-pair feature frame: the pipeline's OWN blocking
    * (same key families, same caps) over the mention set, features via
    * [[Scoring.withFeatures]], label from the gold table — a pair is
    * labeled iff BOTH sides carry a gold entity (inner join), positive
    * iff the entities agree.
    *
    * Supernode collapse is deliberately NOT applied: calibration must see
    * the full feature distribution, including the identical-surface pairs
    * the collapse would hide from scoring.
    *
    * `gold` schema: (mention_id, entity). Result: f_jw, f_lev, f_cos,
    * f_prior, f_agree, label — slim by construction. */
  def labeledFeatures(ms: Dataset[Mention], gold: DataFrame,
                      cfg: graft.Pipeline.Config = graft.Pipeline.Config()): DataFrame = {
    val keyed = Blocking.withBlockKeys(ms, cfg.lsh)
    val pairIds = Blocking.candidatePairs(keyed, cfg.tau, cfg.blockMaxSize,
                                          cfg.starThreshold, cfg.starK)
    val feats = Scoring.withFeatures(Blocking.attachPayload(pairIds, ms), cfg.score)
      .select(col("a.mention_id").as("a_id"), col("b.mention_id").as("b_id"),
              col("f_jw"), col("f_lev"), col("f_cos"), col("f_prior"), col("f_agree"))
    val ga = gold.select(col("mention_id").as("a_id"), col("entity").as("a_e"))
    val gb = gold.select(col("mention_id").as("b_id"), col("entity").as("b_e"))
    feats.join(ga, "a_id").join(gb, "b_id")
      .select(col("f_jw"), col("f_lev"), col("f_cos"), col("f_prior"), col("f_agree"),
              (col("a_e") === col("b_e")).cast("int").as("label"))
  }

  /** [[labeledFeatures]] from a TranscriptGen-style gold mention table
    * (conv_id, turn_idx, begin, entity) — ids derived as [[Ids.mentionId]]
    * exactly like detection does. */
  def labeledFeaturesFromGold(
      ms: Dataset[Mention],
      gold: Dataset[graft.sources.TranscriptGen.GoldMention],
      cfg: graft.Pipeline.Config = graft.Pipeline.Config()): DataFrame =
    labeledFeatures(ms, gold.toDF()
      .select(concat(col("conv_id"), lit(":"),
                     format_string("%06d", col("turn_idx")), lit(":"),
                     format_string("%06d", col("begin"))).as("mention_id"),
              col("entity")), cfg)

  /** @param f1        pair F1 on the FIT split (the selection score —
    *                   optimistically biased by construction)
    * @param holdoutF1 pair F1 on the held-out split the search never saw
    *                   (the honest generalization number; NaN only if the
    *                   labeled set was too small to hold anything out) */
  case class FitResult(cfg: Scoring.ScoreConfig, f1: Double,
                       pairs: Long, positives: Long,
                       holdoutF1: Double)

  private val FeatCols = Seq("f_jw", "f_lev", "f_cos", "f_prior", "f_agree")

  /** Pair F1 of (weights, threshold) on a labeled feature frame, one
    * aggregation pass. NaN on an empty frame. */
  def pairF1(labeled: DataFrame, w: Seq[Double], thr: Double): Double = {
    val score = FeatCols.zipWithIndex.map { case (f, i) => lit(w(i)) * col(f) }
      .reduce(_ + _)
    val pred = score >= thr
    val row = labeled.agg(
      sum(when(pred && col("label") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(pred && col("label") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(!pred && col("label") === 1, 1L).otherwise(0L)).as("fn"))
      .head()
    if (row.isNullAt(0)) Double.NaN
    else {
      val (tp, fp, fn) = (row.getLong(0), row.getLong(1), row.getLong(2))
      if (tp + fp + fn == 0) 1.0 else 2.0 * tp / (2.0 * tp + fp + fn)
    }
  }

  /** For every weight vector in `grid` (gid → 5 weights), the optimal
    * threshold and the pair F1 it attains, in ONE distributed pass.
    *
    * Sweep: with scores sorted descending, predicting "match" at
    * threshold θ = s accepts exactly the pairs scoring ≥ s, so cumulative
    * (tp, fp) over distinct scores enumerates every achievable operating
    * point; F1 = 2·tp / (2·tp + fp + fn) with fn = P − tp. `max_by` over
    * (f1, θ) keeps the best point per grid id — ties break toward the
    * HIGHER threshold (the more conservative edge rule). */
  private def sweep(labeled: DataFrame,
                    grid: Seq[(Int, Seq[Double])]): Map[Int, (Double, Double)] = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val gridDf = grid.map { case (g, ws) =>
      (g, ws(0), ws(1), ws(2), ws(3), ws(4))
    }.toDF("gid", "w1", "w2", "w3", "w4", "w5")
    val score = FeatCols.zipWithIndex.map { case (f, i) =>
      col(s"w${i + 1}") * col(f)
    }.reduce(_ + _)
    val cells = labeled.crossJoin(broadcast(gridDf))
      .groupBy(col("gid"), score.as("score"))
      .agg(sum(col("label")).as("pos"), sum(lit(1) - col("label")).as("neg"))
    val byScore = Window.partitionBy("gid").orderBy(desc("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("gid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val tp = sum(col("pos")).over(byScore)
    val fp = sum(col("neg")).over(byScore)
    val totP = sum(col("pos")).over(whole)
    val f1 = when(totP + fp === 0, lit(1.0)).otherwise(
      lit(2.0) * tp / (lit(2.0) * tp + fp + (totP - tp)))
    cells
      .select(col("gid"), struct(f1.as("f1"), col("score").as("thr")).as("pt"))
      .groupBy("gid").agg(max(col("pt")).as("best"))
      .select(col("gid"), col("best.thr"), col("best.f1"))
      .as[(Int, Double, Double)].collect()
      .map { case (g, thr, f) => g -> (thr, f) }.toMap
  }

  /** Fit weights (coordinate search) + threshold (exact sweep) on a
    * labeled feature frame, maximizing pair F1. Deterministic: fixed
    * candidate multipliers, fixed coordinate order, ties broken toward
    * the incumbent. `rounds` × 5 coordinate passes, one Spark job each;
    * the labeled frame is persisted for the duration.
    *
    * Selection and reporting are SPLIT (round-4 verdict "What's wrong"
    * #3: fitting and reporting on the same pairs is a textbook overfit
    * surface): the sweep sees only a deterministic md5-cell fit split
    * (`1 - holdoutFrac` of the pairs, keyed on the full feature+label row
    * so exact-duplicate pairs never straddle the split), and the returned
    * `holdoutF1` is evaluated on the held-out rest, which no selection
    * step ever read. `holdoutFrac = 0` reproduces the fit-on-all
    * behavior (holdoutF1 = NaN). */
  def fit(labeled0: DataFrame,
          base: Scoring.ScoreConfig = Scoring.ScoreConfig(),
          rounds: Int = 2,
          mults: Seq[Double] = Seq(0.0, 0.25, 0.5, 1.0, 1.5, 2.0),
          holdoutFrac: Double = 0.2): FitResult = {
    require(holdoutFrac >= 0.0 && holdoutFrac < 1.0, "holdoutFrac in [0,1)")
    val rowKey = concat_ws("|", (FeatCols :+ "label").map(col): _*)
    val inFit = Sampling.hashSample(rowKey, 1.0 - holdoutFrac, "calib-holdout")
    val labeled = labeled0.where(inFit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val holdout = labeled0.where(!inFit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = labeled.agg(count(lit(1)), sum("label")).head()
      val nPairs = counts.getLong(0)
      val nPos = if (counts.isNullAt(1)) 0L else counts.getLong(1)
      require(nPairs > 0, "calibration needs a non-empty labeled pair set")

      var w = Array(base.wJaroWinkler, base.wLevRatio, base.wCosine,
                    base.wPriorOverlap, base.wResolvedAgree)
      var (bestThr, bestF1) = sweep(labeled, Seq(0 -> w.toSeq))(0)
      for (_ <- 1 to rounds; coord <- w.indices) {
        // a zeroed coordinate can only re-enter via the absolute rungs —
        // multiplying 0 stays 0, so seed a small absolute ladder too
        val cands = (mults.map(_ * w(coord)) ++ Seq(0.05, 0.15, 0.5))
          .distinct.filter(v => v >= 0.0 && v != w(coord))
        val grid = cands.zipWithIndex.map { case (v, i) =>
          (i, w.toSeq.updated(coord, v))
        }
        val res = sweep(labeled, grid)
        val (gid, (thr, f1)) = res.maxBy { case (g, (_, f)) => (f, -g) }
        if (f1 > bestF1 + 1e-12) {
          w = w.updated(coord, cands(gid)); bestThr = thr; bestF1 = f1
        }
      }
      val hF1 = if (holdoutFrac == 0.0) Double.NaN
                else pairF1(holdout, w.toSeq, bestThr)
      FitResult(
        base.copy(wJaroWinkler = w(0), wLevRatio = w(1), wCosine = w(2),
                  wPriorOverlap = w(3), wResolvedAgree = w(4),
                  threshold = bestThr),
        bestF1, nPairs, nPos, hF1)
    } finally { labeled.unpersist(); holdout.unpersist(); () }
  }

  /** train → persist: fit on labeled pairs and write the artifact that
    * [[Scoring.loadConfig]] (Demo, production entry points) reads. */
  def fitAndSave(labeled: DataFrame, path: String,
                 base: Scoring.ScoreConfig = Scoring.ScoreConfig()): FitResult = {
    val r = fit(labeled, base)
    Scoring.saveConfig(path, r.cfg)
    r
  }
}
