package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (nearest-prior) join — for every left row, the single right row
  * with the greatest timestamp ≤ the left row's timestamp within the same
  * key (the time-series enrichment join Spark lacks natively; reference
  * engines and DuckDB expose it as ASOF JOIN).
  *
  * Composed from existing operators, per the custom-operator preference
  * order (compose > custom plan): tag both sides, UNION, and take a
  * running `last(payload, ignoreNulls)` over a (key)-partitioned window
  * ordered by (ts, side) with right rows sorting before left rows at
  * equal timestamps (ASOF's ≤ tie rule). Cost: ONE shuffle on the key —
  * never the range-predicate pair explosion a naive `l.ts >= r.ts` theta
  * join produces (which is quadratic per key and un-broadcastable at
  * 100 TB); the window scan is linear per key and spills safely.
  *
  * Skew note: a pathologically hot key serializes its own window scan
  * (same as any per-key ordered computation); shard such keys upstream by
  * time-bucketing the key and seeding each bucket with the previous
  * bucket's last right row.
  *
  * Determinism: if several right rows share (key, ts), whichever sorts
  * last wins — pre-deduplicate the right side per (key, ts) when exact
  * reproducibility across engines matters (q38 does).
  */
object AsOfJoin {

  /** Inner as-of join: left rows with no prior right row are dropped.
    *
    * @param key          equi-join key columns (both sides)
    * @param ts           timestamp column name (both sides)
    * @param rightPayload right columns to carry (aliased as-is; must not
    *                     collide with left column names and must be
    *                     non-null on real right rows — nulls are what
    *                     marks "no payload" inside the running window)
    */
  def lastPrior(left: DataFrame, right: DataFrame,
                key: Seq[String], ts: String,
                rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.intersect(leftCols).isEmpty,
            s"right payload collides with left columns: " +
            s"${rightPayload.intersect(leftCols).mkString(",")}")
    val l = left
      .withColumn("_side", lit(1))
      .select((leftCols.map(col) ++
               rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
               col("_side")): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select((leftCols.map(c =>
                 if (key.contains(c) || c == ts) col(c)
                 else lit(null).cast(left.schema(c).dataType).as(c)) ++
               rightPayload.map(col) :+ col("_side")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select((leftCols.map(col) ++
               rightPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
               col("_side")): _*)
    filled
      .where(col("_side") === 1 && col(rightPayload.head).isNotNull)
      .drop("_side")
  }
}
