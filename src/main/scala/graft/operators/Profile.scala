package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column-level data profiling — the first thing anyone runs against an
  * unfamiliar corpus drop: row counts, null rates, cardinalities, value
  * ranges, numeric center/median, one row per profiled column.
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's metrics simultaneously (a single agg with per-column
  * expressions, map-side partial everything), then the 1-row result is
  * unpivoted driver-free with `stack`. No per-column re-scan of a 100-TB
  * table.
  *
  * Exactness: `count(DISTINCT)` and `percentile` here are the EXACT
  * forms so the operator oracles bit-for-bit against DuckDB (q60). At
  * 10¹²-row scale swap `approx_count_distinct` (HLL++, fixed-size
  * sketch) and `approx_percentile` — same call shape, one line each;
  * the exact distinct forces one expand+shuffle per distinct column and
  * the exact percentile buffers values, both unfit beyond ~10⁹ rows. */
object Profile {

  /** Profile `cols` of `df`: (col_name, n, n_null, n_distinct, min_v,
    * max_v, mean, p50). `mean`/`p50` are null for non-numeric columns;
    * `min_v`/`max_v` are stringified for a uniform schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    // column names appear in SQL text (percentile + stack) and even the
    // Column API parses backticks in attribute names — so work over a
    // POSITIONALLY renamed frame with safe generated names and carry the
    // original name only as a quoted data literal
    val idx = df.columns.zipWithIndex.toMap
    cols.foreach(c => require(idx.contains(c), s"profile: no such column: $c"))
    val safeDf = df.toDF(df.columns.indices.map(i => s"__c$i"): _*)
    def sc(c: String) = col(s"__c${idx(c)}")
    def sn(c: String, suffix: String) = s"__c${idx(c)}__$suffix"
    val qLit = (s: String) => "'" + s.replace("'", "''") + "'"
    val exprs = cols.flatMap { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        sum(when(sc(c).isNull, 1L).otherwise(0L)).as(sn(c, "nulls")),
        countDistinct(sc(c)).as(sn(c, "distinct")),
        min(sc(c)).cast("string").as(sn(c, "min")),
        max(sc(c)).cast("string").as(sn(c, "max")),
        (if (numeric) round(avg(sc(c)), 6)
         else lit(null).cast("double")).as(sn(c, "mean")),
        (if (numeric) round(expr(s"percentile(__c${idx(c)}, 0.5)"), 6)
         else lit(null).cast("double")).as(sn(c, "p50")))
    } :+ count(lit(1)).as("__n")
    val row = safeDf.agg(exprs.head, exprs.tail: _*)
    val stacked = cols.map { c =>
      s"${qLit(c)}, `__n`, `${sn(c, "nulls")}`, `${sn(c, "distinct")}`, " +
      s"`${sn(c, "min")}`, `${sn(c, "max")}`, `${sn(c, "mean")}`, `${sn(c, "p50")}`"
    }.mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stacked) as " +
      "(col_name, n, n_null, n_distinct, min_v, max_v, mean, p50)")
  }
}
