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
    val exprs = cols.flatMap { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        (if (numeric) round(avg(col(c)), 6)
         else lit(null).cast("double")).as(s"${c}__mean"),
        (if (numeric) round(expr(s"percentile(`$c`, 0.5)"), 6)
         else lit(null).cast("double")).as(s"${c}__p50"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(exprs.head, exprs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', `__n`, `${c}__nulls`, `${c}__distinct`, " +
      s"`${c}__min`, `${c}__max`, `${c}__mean`, `${c}__p50`"
    }.mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stacked) as " +
      "(col_name, n, n_null, n_distinct, min_v, max_v, mean, p50)")
  }
}
