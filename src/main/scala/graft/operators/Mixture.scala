package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mixture materialization by TOKEN budget — the "data mixture"
  * step between corpus curation and batch assembly: given a curated corpus
  * with a class column (source, language, domain) and a token budget per
  * class, down-sample each class to its budget and emit the mixed corpus.
  * Balancing by tokens rather than documents is the point: sources differ
  * by orders of magnitude in document length, and every published mixture
  * recipe (The Pile, LLaMA, Gopher) states its proportions in tokens.
  *
  * The keep decision composes two engine-reproducible pieces:
  * per-class token totals (one slim map-side-combinable aggregation over
  * (class, n_tokens) — text never crosses the shuffle) and
  * [[Sampling]]-style md5-cell predicates (a pure function of the row key,
  * so the mixture is stable under repartitioning, AQE, and incremental
  * re-runs, and RAISING a budget only ADDS rows — monotone growth, no
  * reshuffling of what a previous run already picked). The per-class
  * fraction frac_c = min(1, budget_c / total_tokens_c) is quantized to
  * [[CellsTotal]] md5 cells (`hashSampleAt` mechanics at [[HexChars]] hex
  * chars — fine enough that a positive budget never quantizes a class to
  * zero), which is what makes the whole chain expressible as closed-form
  * SQL (q66's exact DuckDB oracle).
  *
  * Scale shape (100 TB): the totals frame has one row per class — it
  * broadcasts; the keep-filter is map-only column math. Sampling error vs
  * the budget is the binomial deviation of cell sampling (~1/sqrt(cells
  * picked)) plus the 1/256 grid quantum; both are policy noise at corpus
  * scale, not correctness — the FRACTION is exact by construction.
  */
object Mixture {

  /** Per-class totals and keep fractions for `budgets` (classes absent
    * from the map get `defaultBudget`). Output: (cls, total_tokens,
    * frac, cells) where `cells` is the quantized md5-cell bound used by
    * [[materialize]]. */
  def fractions(df: DataFrame, clsCol: String, textCol: String,
                budgets: Map[String, Long],
                defaultBudget: Long = Long.MaxValue): DataFrame = {
    val totals = df
      .select(col(clsCol).as("cls"),
              size(TextFns.tokens(col(textCol))).cast("long").as("_n_tok"))
      .groupBy("cls")
      .agg(sum("_n_tok").as("total_tokens"))
    val budgetExpr: Column = budgets.toSeq.sortBy(_._1) match {
      case Seq() => lit(defaultBudget)
      case (k0, v0) +: rest =>
        rest.foldLeft(when(col("cls") === k0, v0)) {
          case (e, (k, v)) => e.when(col("cls") === k, v)
        }.otherwise(lit(defaultBudget))
    }
    totals
      .withColumn("frac",
        least(lit(1.0), budgetExpr.cast("double") / col("total_tokens")))
      // floor at 1 cell for any POSITIVE fraction: round(frac·16^6) is 0
      // below ~3e-8 (a 10^5-token budget against a 10^13-token class —
      // plausible at 100 TB), silently dropping a positively-budgeted
      // class against the documented invariant (round-5 ADVICE). At
      // every tested SF round(...) >= 1 already, so this is
      // oracle-neutral; the q66 oracle keeps the plain round, which is
      // equal wherever the driver evaluates it.
      .withColumn("cells",
        when(col("frac") > 0,
          greatest(lit(1), round(col("frac") * CellsTotal, 0).cast("int")))
          .otherwise(lit(0)))
  }

  /** 16^6 cells (6 md5 hex chars). The 2-hex grid `Sampling.hashSample`
    * defaults to quantizes fractions below 1/512 to ZERO — at corpus
    * scale any realistic budget/total ratio is far below that, and a
    * positive budget must never drop a class entirely (the
    * `hashSampleAt` lesson, applied here by default). 16.7M cells keep
    * fractions down to ~6e-8 non-degenerate. */
  val HexChars = 6
  val CellsTotal: Int = 1 << (4 * HexChars)

  /** The mixed corpus: input rows (all columns preserved) down-sampled
    * per class to its token budget via the md5-cell predicate on
    * `keyCol`. Classes at or under budget are kept whole. NULL classes
    * are real rows (the join is null-safe): they form their own class
    * under `defaultBudget`. */
  def materialize(df: DataFrame, keyCol: String, clsCol: String,
                  textCol: String, budgets: Map[String, Long],
                  defaultBudget: Long = Long.MaxValue,
                  seed: String = ""): DataFrame = {
    val fr = fractions(df, clsCol, textCol, budgets, defaultBudget)
      .select(col("cls").as("_cls"), col("cells").as("_cells"))
    val bound = when(col("_cells") >= CellsTotal, lit("g"))
      .otherwise(format_string(s"%0${HexChars}x", col("_cells")))
    df.join(broadcast(fr), df(clsCol) <=> col("_cls"))
      .where(substring(md5(concat(col(keyCol).cast("string"), lit(seed))),
                       1, HexChars) < bound)
      .select(df.columns.map(col): _*)
  }
}
