package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document table — the standard
  * "what is this document about" tagger a corpus pipeline runs before
  * mixture balancing or topic-targeted sampling.
  *
  * Scale shape (nothing here holds a vocabulary in memory):
  *
  *  - term frequencies: token explode → groupBy (id, term) count — the
  *    explode is map-only and the count partial-aggregates map-side, so
  *    the shuffle carries one slim (id, term, tf) row per DISTINCT term
  *    occurrence, not one per token;
  *  - document frequencies: groupBy term over the (id, term) rows — the
  *    vocabulary table, slim (term, df), shuffled by term (uniform:
  *    hot TERMS exist but each contributes ONE row per doc already
  *    pre-aggregated);
  *  - idf join back on term: a shuffle equi-join of two term-keyed
  *    tables (AQE handles the Zipf head); tfidf math is codegen column
  *    arithmetic;
  *  - top-k per doc: window row_number over (id) partitions — each
  *    partition is one document's distinct terms, never the corpus.
  *
  * Determinism: ties broken by term ascending; equal tfidf values arise
  * exactly from equal (tf, df) pairs, so the ordering is reproducible
  * across engines (exact-oracled in q60 vs DuckDB).
  */
object TfIdf {

  /** Smoothed idf: ln((N + 1) / (df + 1)) + 1 — strictly positive, so
    * corpus-universal terms still rank by tf instead of vanishing. */
  private def idf(nDocs: Column, df: Column): Column =
    log((nDocs + lit(1.0)) / (df + lit(1.0))) + lit(1.0)

  /** Top-`k` terms per document by tf-idf.
    *
    * Output: (id, term, tf, df, tfidf, rank) — `rank` 1-based within the
    * document, `tfidf` rounded to 6 places for stable comparison. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    // slim (id, text) fanned out before the tokenize+explode kernel — a
    // single-row-group source would run the whole regex pass on one core
    // (Fanout Scaladoc; no-op at production scan sizes)
    val terms = Fanout(docs.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"), explode(TextFns.tokens(col("_t"))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfs = terms.groupBy("term").agg(count(lit(1)).as("df"))
    // N is a scalar: one count of the doc table, joined in as a literal
    // via crossJoin of a 1-row frame (no driver collect in the plan's
    // hot path; Spark folds the broadcast nested loop to a constant)
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = terms.join(dfs, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * idf(col("n_docs"), col("df")), 6))
    val w = Window.partitionBy("id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id", "term", "tf", "df", "tfidf", "rank")
  }
}
