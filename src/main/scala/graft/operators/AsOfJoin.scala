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
  * running `last(ignoreNulls)` over a (key)-partitioned window ordered by
  * (ts, side) with right rows sorting before left rows at equal
  * timestamps (ASOF's ≤ tie rule). Cost: ONE shuffle on the key — never
  * the range-predicate pair explosion a naive `l.ts >= r.ts` theta join
  * produces (which is quadratic per key and un-broadcastable at 100 TB);
  * the window scan is linear per key and spills safely.
  *
  * Payload integrity: ALL right payload columns ride in ONE struct and
  * the window fills that single struct, so every payload value a left row
  * receives comes from the SAME right row — a legitimately-NULL payload
  * column can never mix values from different right rows — and match
  * detection is a dedicated `lit(true)` marker inside the struct, never
  * payload nullness (round-4 ADVICE).
  *
  * Skew: a pathologically hot key serializes its own window scan (same
  * as any per-key ordered computation). [[lastPriorSharded]] implements
  * the sharding recipe as code: time-bucket the key, compute each
  * bucket's seed (the last right row of any EARLIER bucket — itself a
  * tiny per-bucket as-of join), and window over (key, bucket) — the hot
  * key's serial scan drops from O(rows) to O(rows/buckets), exactness
  * preserved (property-tested ≡ [[lastPrior]] in AsOfJoinSpec).
  *
  * Determinism: if several right rows share (key, ts), whichever sorts
  * last wins — pre-deduplicate the right side per (key, ts) when exact
  * reproducibility across engines matters (q38 does; lastPriorSharded's
  * per-bucket max_by assumes it).
  */
object AsOfJoin {

  private val M = "_asof" // struct column carrying (marker, payload...)

  /** Inner as-of join: left rows with no prior right row are dropped.
    *
    * @param key          equi-join key columns (both sides)
    * @param ts           timestamp column name (both sides)
    * @param rightPayload right columns to carry (aliased as-is; must not
    *                     collide with left column names; NULL payload
    *                     values are carried faithfully — matching keys
    *                     off the marker, not nullness)
    */
  def lastPrior(left: DataFrame, right: DataFrame,
                key: Seq[String], ts: String,
                rightPayload: Seq[String]): DataFrame =
    lastPriorImpl(left, right, key, ts, rightPayload)

  /** [[lastPrior]] with hot-key sharding: window partitions are
    * (key, time-bucket of `bucketSeconds`), each bucket seeded with the
    * last right row of any earlier bucket so results are identical to
    * the unsharded join. Use when one key carries enough rows that its
    * serial window scan is the straggler. */
  def lastPriorSharded(left: DataFrame, right: DataFrame,
                       key: Seq[String], ts: String,
                       rightPayload: Seq[String],
                       bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // same fail-fast as lastPrior — the sharded path assembles its
    // output via finish() directly, so without this check a collision
    // surfaces as a duplicate-named column downstream, not an error
    require(rightPayload.intersect(left.columns.toSeq).isEmpty,
            s"right payload collides with left columns: " +
            s"${rightPayload.intersect(left.columns.toSeq).mkString(",")}")
    val bkt = floor(col(ts).cast("timestamp").cast("double") / bucketSeconds)
      .cast("long")

    // last right row per (key, bucket): slim agg, deduped-right assumed
    val rb = right.groupBy((key.map(col) :+ bkt.as("_bkt")): _*)
      .agg(max_by(struct((col(ts).as("_r_ts") +: rightPayload.map(col)): _*),
                  col(ts)).as("_last_r"))

    // seed for each left bucket = the rb row of the greatest EARLIER
    // bucket — itself an as-of join, but over one row per (key, bucket):
    // the hot key contributes #buckets rows here, not #events
    val lb = left.select((key.map(col) :+ bkt.as("_bkt")): _*).distinct()
    val seeds = lastPriorImpl(
        lb.withColumn("_prev", col("_bkt") - 1),
        rb.select((key.map(col) :+ col("_bkt").as("_prev") :+ col("_last_r")): _*),
        key, "_prev", Seq("_last_r"))
      .select((key.map(col) :+ col("_bkt") :+
               col("_last_r._r_ts").as(ts) :+
               struct((lit(true).as("_matched") +:
                       rightPayload.map(c => col(s"_last_r.$c").as(c))): _*).as(M)): _*)

    // seed rows carry their ORIGINAL right ts (< bucket start by
    // construction), so within a (key, bucket) partition they sort
    // before every native row and the normal window logic applies
    val l = left.select((left.columns.map(col) :+ bkt.as("_bkt") :+
                         lit(null).cast(seeds.schema(M).dataType).as(M) :+
                         lit(1).as("_side")): _*)
    val r = rightAsUnionRows(left, right, key, ts, rightPayload)
      .withColumn("_bkt", bkt)
    val s = seeds.select((left.columns.map(c =>
        if (key.contains(c) || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("_bkt") :+ col(M) :+ lit(0).as("_side")): _*)

    finish(l.unionByName(r).unionByName(s), left, key :+ "_bkt", ts, rightPayload)
      .drop("_bkt")
  }

  /** Right rows shaped like the left frame + the payload struct. */
  private def rightAsUnionRows(left: DataFrame, right: DataFrame,
                               key: Seq[String], ts: String,
                               rightPayload: Seq[String]): DataFrame =
    right.select((left.columns.toSeq.map(c =>
      if (key.contains(c) || c == ts) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)) :+
      struct((lit(true).as("_matched") +: rightPayload.map(col)): _*).as(M) :+
      lit(0).as("_side")): _*)

  private def lastPriorImpl(left: DataFrame, right: DataFrame,
                            key: Seq[String], ts: String,
                            rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.intersect(leftCols).isEmpty,
            s"right payload collides with left columns: " +
            s"${rightPayload.intersect(leftCols).mkString(",")}")
    val r = rightAsUnionRows(left, right, key, ts, rightPayload)
    val l = left.select((leftCols.map(col) :+
      lit(null).cast(r.schema(M).dataType).as(M) :+ lit(1).as("_side")): _*)
    finish(l.unionByName(r), left, key, ts, rightPayload)
  }

  /** Shared tail: running last over the payload struct, keep matched left
    * rows, unpack the struct. */
  private def finish(unioned: DataFrame, left: DataFrame,
                     partCols: Seq[String], ts: String,
                     rightPayload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(M, last(col(M), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col(s"$M._matched"))
      .select((left.columns.toSeq.map(col) ++
               rightPayload.map(c => col(s"$M.$c").as(c))): _*)
  }
}
