package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boilerplate-turn removal — the transcript analogue of CCNet's
  * shared-paragraph dedup (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", LREC 2020): text that recurs
  * near-verbatim across many *independent* documents is template/boilerplate,
  * not content, and keeping every copy skews any model trained on the corpus
  * toward the template. Here the unit is a TURN and independence means
  * distinct conversations: a normalized turn key seen in ≥ `minConvs`
  * different conversations is boilerplate (canned greetings, tool banners,
  * system preludes), and every turn carrying that key is dropped.
  *
  * The key is the first `keyTokens` normalized tokens rather than the whole
  * text: real boilerplate is template-with-slots ("Thanks for contacting
  * <name>…"), and a short prefix is the standard cheap template signature —
  * exact-whole-text duplicates are already `Dedup.exact`'s job. Turns with
  * fewer than `keyTokens` tokens key on all their tokens; an empty token
  * list keys on "".
  *
  * Scale shape (100 TB): the frequency aggregation sees only the two slim
  * columns (key, conv_id) — never the text — with map-side partial
  * aggregation; the catalog that comes back is templates-only (tiny by
  * construction: each entry needs ≥ minConvs distinct conversations, so its
  * size is bounded by total_convs / minConvs) and the removal is a
  * key-equi anti-join that AQE turns into a broadcast when the catalog fits.
  */
object Boilerplate {

  /** Normalized template key: first `keyTokens` tokens of the text,
    * lowercased alnum, space-joined. */
  def prefixKey(text: Column, keyTokens: Int): Column =
    concat_ws(" ", slice(TextFns.tokens(text), 1, keyTokens))

  /** Boilerplate template catalog: keys appearing in ≥ `minConvs` distinct
    * conversations, with their conversation and turn counts.
    * Output: (prefix, n_convs, n_turns). */
  def catalog(turns: DataFrame, textCol: String, convCol: String,
              keyTokens: Int, minConvs: Int): DataFrame =
    turns
      .select(prefixKey(col(textCol), keyTokens).as("prefix"), col(convCol).as("cv"))
      .groupBy("prefix")
      .agg(countDistinct("cv").as("n_convs"), count(lit(1)).as("n_turns"))
      .where(col("n_convs") >= minConvs)

  /** The input minus boilerplate turns (all columns preserved). */
  def clean(turns: DataFrame, textCol: String, convCol: String,
            keyTokens: Int, minConvs: Int): DataFrame = {
    val cat = catalog(turns, textCol, convCol, keyTokens, minConvs)
      .select("prefix")
    turns
      .withColumn("_bp_key", prefixKey(col(textCol), keyTokens))
      .join(cat.withColumnRenamed("prefix", "_bp_key"), Seq("_bp_key"), "left_anti")
      .drop("_bp_key")
  }
}
