package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded time-RANGE join — all (left, right) pairs within the same key
  * whose timestamps differ by at most `windowSec` (the interval/range
  * join Spark plans as a per-key NESTED LOOP when written as a theta
  * join, which is quadratic per key and fatal at 100 TB).
  *
  * Scale shape: time-BUCKETIZATION turns the range predicate into an
  * equi-join. With bucket width = windowSec, two rows within windowSec
  * are always in the same or an adjacent bucket, so the LEFT side lands
  * in its own bucket while the RIGHT side is duplicated into
  * (bucket−1, bucket, bucket+1); every in-window pair meets in exactly
  * the left row's bucket (the three copies have distinct bucket values,
  * so no pair joins twice), and a final exact |Δts| ≤ window filter
  * removes the near-misses. Cost: ONE equi-shuffle on (key, bucket)
  * with 3× the right side, candidates ≤ rows sharing adjacent buckets —
  * linear in true pair density, never all-pairs-per-key. (Same family
  * as the LSH band trick: coarse bucket recall + exact verification.)
  *
  * Timestamps compare at whole-second resolution (epoch-seconds
  * truncation, matching Spark's timestamp→long cast) so the boundary
  * predicate is engine-reproducible.
  *
  * Emits non-key columns with the given prefixes (key columns keep their
  * names); symmetric self-joins should de-duplicate with an id ordering
  * predicate downstream (q42 does `a_event_id < b_event_id`).
  */
object RangeJoin {

  def withinWindow(left: DataFrame, right: DataFrame,
                   key: Seq[String], ts: String, windowSec: Long,
                   leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")

    // bucket from the un-prefixed column, then prefix the payload
    def prep(df: DataFrame, prefix: String): DataFrame =
      df.withColumn("_bucket", floor(col(ts).cast("timestamp").cast("long") / windowSec))
        .select(key.map(col) ++
          df.columns.filterNot(key.contains).map(c => col(c).as(prefix + c)) :+
          col("_bucket"): _*)

    val l = prep(left, leftPrefix)
    val r = prep(right, rightPrefix)
      .withColumn("_bucket",
        explode(array(col("_bucket") - 1, col("_bucket"), col("_bucket") + 1)))

    val dt = col(leftPrefix + ts).cast("timestamp").cast("long") -
      col(rightPrefix + ts).cast("timestamp").cast("long")
    l.join(r, key :+ "_bucket")
      .where(abs(dt) <= windowSec)
      .drop("_bucket")
  }
}
