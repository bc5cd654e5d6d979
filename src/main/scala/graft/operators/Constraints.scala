package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Human-in-the-loop constraint overlay for the clustering stage —
  * MUST-LINK and CANNOT-LINK pair constraints, the adjudication feedback
  * every production ER deployment accumulates (reviewers confirming or
  * rejecting merges).
  *
  * Semantics (deliberately asymmetric, and documented as such):
  *  - MUST-LINK pairs are unioned into the edge set BEFORE connected
  *    components — adjudication outranks the scorer, and transitivity is
  *    exactly what CC gives (A must-link B, B scored-with C ⇒ one
  *    cluster).
  *  - CANNOT-LINK pairs are AUDITED after clustering: pairs that landed
  *    in one cluster are emitted as a violation worklist. They are NOT
  *    enforced by splitting — constrained correlation clustering is
  *    NP-hard, any greedy split is order-dependent (non-deterministic
  *    under repartitioning), and silently un-merging hides the real
  *    signal: a violated cannot-link means a scoring edge (or another
  *    constraint) is WRONG, which a human should see, not a heuristic
  *    bury. The violation table is the review queue.
  *
  * Scale shape: must-link is a union of slim (src, dst) rows before the
  * existing CC (no new shuffle class); the audit is two hash joins of the
  * constraint list (small side, broadcastable) against the assignment
  * table.
  */
object Constraints {

  /** Connected components over `edges` ∪ `mustLink` (both (src, dst),
    * same id domain). Output: (node, cluster_id = min node id). */
  def clusterWithMustLink(edges: DataFrame, mustLink: DataFrame): DataFrame =
    Clustering.connectedComponents(
      edges.select(col("src"), col("dst"))
        .unionByName(mustLink.select(col("src"), col("dst")))
        .dropDuplicates("src", "dst"))

  /** Cannot-link audit: constraint pairs whose two sides share a cluster
    * in `assign` (node, cluster_id). Output: (a, b, cluster_id), a < b.
    * Constraint pairs with either side absent from `assign` (singleton
    * nodes never entered the edge graph) cannot be violated and are not
    * emitted. */
  def violations(assign: DataFrame, cannotLink: DataFrame): DataFrame = {
    val norm = cannotLink.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .dropDuplicates("a", "b")
    norm
      .join(assign.select(col("node").as("a"), col("cluster_id").as("_ca")), "a")
      .join(assign.select(col("node").as("b"), col("cluster_id").as("_cb")), "b")
      .where(col("_ca") === col("_cb"))
      .select(col("a"), col("b"), col("_ca").as("cluster_id"))
  }
}
