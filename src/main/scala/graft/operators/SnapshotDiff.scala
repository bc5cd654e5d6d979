package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the versioning primitive of a periodically
  * re-crawled / re-exported training corpus: given two snapshots of the same
  * logical table, emit one row per document whose content changed between
  * them (`added` / `removed` / `changed`), excluding the unchanged majority.
  * The output drives everything downstream of an corpus refresh: which docs
  * to re-embed, which conversations to feed `Pipeline.runIncremental` /
  * `runRetraction`, what a release note claims.
  *
  * Scale shape (100 TB): both sides are projected to (id, md5(text)) BEFORE
  * the join, so only two slim columns per side cross the full-outer shuffle —
  * never the payload. Content equality via fixed-width digest rather than
  * text comparison keeps the join row narrow and the comparison
  * constant-time. When the snapshots are stored bucketed by id
  * (TableIO.writeBucketed, the compactState discipline), the full-outer join
  * is exchange-free on both sides.
  */
object SnapshotDiff {

  /** One row per id whose content differs between snapshots.
    * Output: (id, status ∈ {added, removed, changed}, old_sig, new_sig). */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    // NULL text gets a sentinel signature: md5(null) is null, and a null
    // sig is indistinguishable from "row absent" — a doc present in both
    // snapshots with null text would read as 'added' (and a removed one
    // too). The sentinel is not a valid md5, so it can't collide with a
    // real signature.
    val sig = (c: org.apache.spark.sql.Column) =>
      coalesce(md5(c), lit("null-text"))
    val o = oldDf.select(col(idCol).as("id"), sig(col(textCol)).as("old_sig"))
    val n = newDf.select(col(idCol).as("id"), sig(col(textCol)).as("new_sig"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("old_sig").isNull, "added")
          .when(col("new_sig").isNull, "removed")
          .otherwise("changed"))
      .where(col("old_sig").isNull || col("new_sig").isNull ||
             col("old_sig") =!= col("new_sig"))
      .select("id", "status", "old_sig", "new_sig")
  }
}
