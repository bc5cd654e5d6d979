package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-data curation chain as ONE composed operator — the
  * pipeline a corpus owner actually ships, wired from the library's own
  * stages in their canonical order:
  *
  *   1. exact dedup            ([[Dedup.exact]], keep the min-id copy)
  *   2. eval-set decontamination ([[Decontaminate.clean]] vs a benchmark)
  *   3. PII redaction          ([[Redact.withRedaction]] — every later
  *                              stage sees only the SCRUBBED text)
  *   4. quality gate           (min token count + distinct-token ratio,
  *                              the Gopher-style repetition cut)
  *   5. token-budget mixture   ([[Mixture.materialize]] per class)
  *   6. sequence packing       ([[Packing.packBucketed]] into ≤L bins)
  *
  * Output: (id, class, tok_len, bin_key) — the packed training batches.
  *
  * Ordering rationale: dedup before decontamination (don't pay the gram
  * join for copies), redaction before the quality gate and mixture (token
  * budgets must count what training will actually see), packing last
  * (bins are only valid over the final membership). Every stage is
  * individually oracled (q18/q50/q51/q22·q58/q66/q54); the composition is
  * oracled end-to-end by q68's single SQL replay, which is the point —
  * stage-wise correctness does not prove the hand-offs (which text
  * column, which token definition, which membership each stage sees), the
  * composed oracle does.
  *
  * Scale shape: inherited from the parts — each stage is map-only or
  * slim-keyed; the only corpus-payload shuffles are the dedup hash
  * groupBy's slim (sig, id) rows and packing's (id, tok_len) window.
  */
object Curation {

  /** Stage parameters; defaults match q68. */
  case class CurationConfig(
      decontamN: Int = 3,
      minTokens: Int = 5,
      minDistinctRatio: Double = 0.3,
      budgetPerClass: Long = 800L,
      maxTokens: Int = 128,
      granularity: Int = 16,
      shardHexChars: Int = 1)

  def curate(corpus0: DataFrame, benchmark: DataFrame,
             idCol: String, clsCol: String, textCol: String,
             cfg: CurationConfig = CurationConfig()): DataFrame = {
    // fan the corpus out to the core count once, up front: every stage
    // below is a per-row kernel (md5, gram explode, 4-regex redaction
    // chain, tokenize) that a single-row-group source would run on one
    // core. Projected to the three columns the chain reads FIRST (the
    // Fanout contract: slim projections only — an exchange below the
    // projection would ship every corpus column and block pushdown).
    val corpus = Fanout(
      corpus0.select(col(idCol), col(clsCol), col(textCol)))
    val reps = Dedup.exact(corpus, idCol, textCol)
      .where(col("id") === col("rep_id"))
      .select(col("id").as(idCol))
    val deduped = corpus.join(reps, Seq(idCol), "left_semi")

    val decon = Decontaminate.clean(deduped, benchmark, idCol, textCol, cfg.decontamN)

    val redacted = Redact.withRedaction(decon, textCol)
      .drop(Redact.Defaults.map(c => s"n_${c.name}"): _*)

    val toks = TextFns.tokens(col("redacted"))
    val quality = redacted
      .withColumn("_n_tok", size(toks))
      .where(col("_n_tok") >= cfg.minTokens &&
        when(col("_n_tok") > 0,
            size(array_distinct(toks)).cast("double") / col("_n_tok"))
          .otherwise(0.0) >= cfg.minDistinctRatio)

    // mixed feeds BOTH packBucketed and the class-restore join; without
    // the persist the whole upstream chain (dedup groupBy, gram join,
    // 4 regex passes, mixture agg+join) would execute twice
    val mixed = graft.CacheTracker.register(
      Mixture.materialize(quality, idCol, clsCol, "redacted",
          Map.empty, cfg.budgetPerClass)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    Packing.packBucketed(mixed, idCol, "redacted",
        cfg.maxTokens, cfg.granularity, cfg.shardHexChars)
      .join(mixed.select(col(idCol).as("id"), col(clsCol)), "id")
      .select(col("id").as(idCol), col(clsCol), col("tok_len"), col("bin_key"))
  }
}
