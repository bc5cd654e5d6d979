package graft.operators

import org.apache.spark.sql.graft.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise scoring stage (SURVEY.md §3 Stage B; north_rule "batched
  * Jaro-Winkler/Levenshtein string similarity plus cosine similarity over
  * context embeddings (mirroring REL's local-context + prior scoring)").
  *
  * Pure column math over the pair DataFrame — every feature is either a
  * codegen'd built-in (`levenshtein`), a custom codegen'd Catalyst
  * expression (`jaro_winkler`, `cosine_sim`), or a higher-order array
  * function over the (≤ top-K) candidate lists. No UDFs, no shuffles: the
  * stage is map-only over the already-joined pairs.
  */
object Scoring {

  /** Feature weights + decision threshold. Defaults calibrated on the
    * golden fixture set (PipelineSpec) to pairwise F1 ≥ 0.99.
    *
    * Weight design: ED agreement dominates (REL semantics — two mentions
    * corefer iff they link to the same entity; alias surfaces have zero
    * string similarity), gated on both mentions' resolution-confidence
    * margin ≥ minMargin so an uncertain disambiguation can never bridge
    * two clusters transitively. String/context features corroborate and
    * carry out-of-dictionary near-duplicates. */
  case class ScoreConfig(
      wJaroWinkler: Double = 0.15,
      wLevRatio: Double = 0.05,
      wCosine: Double = 0.15,
      wPriorOverlap: Double = 0.15,
      wResolvedAgree: Double = 0.50,
      minMargin: Double = 0.02,
      threshold: Double = 0.50)

  /** Adds feature + score columns to a pair frame with `a`/`b` Mention
    * structs. Kept separate from `edges` so oracle queries can dump raw
    * features. */
  def withFeatures(pairs: DataFrame, cfg: ScoreConfig = ScoreConfig()): DataFrame = {
    val jw = GraftFunctions.jaroWinkler(col("a.norm"), col("b.norm"))
    val maxLen = greatest(length(col("a.norm")), length(col("b.norm")))
    val levRatio = when(maxLen > 0,
      lit(1.0) - levenshtein(col("a.norm"), col("b.norm")).cast("double") / maxLen)
      .otherwise(1.0)
    val cos = GraftFunctions.cosineSim(col("a.ctx"), col("b.ctx"))
    // max over shared candidate entities of min(prior_a, prior_b):
    // probability mass both surfaces put on a common entity.
    val priorOverlap = expr(
      """aggregate(
        |  a.candidates, cast(0.0 as double),
        |  (acc, c) -> greatest(acc, coalesce(least(
        |       c.prior,
        |       map_from_entries(transform(b.candidates,
        |                                  d -> struct(d.entity, d.prior)))[c.entity]),
        |     cast(0.0 as double))))""".stripMargin)
    val agree = when(
      col("a.resolved") =!= "" && col("a.resolved") === col("b.resolved") &&
      col("a.resolvedScore") >= cfg.minMargin &&
      col("b.resolvedScore") >= cfg.minMargin, 1.0).otherwise(0.0)
    pairs
      .withColumn("f_jw", jw)
      .withColumn("f_lev", levRatio)
      .withColumn("f_cos", cos)
      .withColumn("f_prior", priorOverlap)
      .withColumn("f_agree", agree)
      .withColumn("score",
        lit(cfg.wJaroWinkler) * col("f_jw") +
        lit(cfg.wLevRatio) * col("f_lev") +
        lit(cfg.wCosine) * col("f_cos") +
        lit(cfg.wPriorOverlap) * col("f_prior") +
        lit(cfg.wResolvedAgree) * col("f_agree"))
  }

  /** Thresholded match edges (src < dst by construction of the pairs). */
  def edges(pairs: DataFrame, cfg: ScoreConfig = ScoreConfig()): DataFrame =
    withFeatures(pairs, cfg)
      .where(col("score") >= cfg.threshold)
      .select(col("a.mention_id").as("src"), col("b.mention_id").as("dst"))
}
