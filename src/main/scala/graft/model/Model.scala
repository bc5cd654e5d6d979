package graft.model

import java.sql.Timestamp

/** Typed data model of the ER pipeline (SURVEY.md §1.3, BASELINE.json
  * input_hint). Case classes are the stage-boundary contracts; inside a
  * stage we work on DataFrames so Catalyst prunes columns freely.
  */

/** Canonical input row — one turn of a multi-turn transcript.
  * Schema fixed by BASELINE.json::input_hint. */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** One candidate entity for a surface form with its commonness prior —
  * the REL p(e|m) dictionary row payload (SURVEY.md D3). */
case class Candidate(entity: String, prior: Double)

/** Prior-dictionary entry: normalized surface form → candidates.
  * `lower` + `freq` drive REL's case-normalization cascade
  * (mention_detection.py::preprocess_mention, SURVEY.md §2.2 [M]). */
case class DictEntry(
    mention: String,
    lower: String,
    freq: Long,
    candidates: Array[Candidate])

/** A detected mention. `mention_id` is globally unique, lexicographically
  * sortable, and deterministic: zero-padded "conv:turn:begin". Cluster ids
  * are min(mention_id), so determinism of the id IS determinism of the
  * output clustering. */
case class Mention(
    mention_id: String,
    conv_id: String,
    turn_idx: Int,
    begin: Int,       // token offset, inclusive
    end: Int,         // token offset, exclusive
    surface: String,  // raw matched text (joined tokens)
    norm: String,     // normalized surface (dictionary key)
    candidates: Array[Candidate],
    ctx: Array[Float], // mean context-token hash embedding
    resolved: String,  // ED argmax entity ("" if unresolvable)
    resolvedScore: Double)

/** Match edge between two mention ids (src < dst lexicographically). */
case class Edge(src: String, dst: String)

/** Final cluster assignment: cluster_id = min mention_id of the component. */
case class ClusterAssign(mention_id: String, cluster_id: String)

object Ids {
  /** Zero-padded sortable mention id. Turn/begin widths bound the scale:
    * 6 digits each ≈ 10^6 turns/conv and tokens/turn — far above real
    * transcript shapes; conv_id is free-form and compared as a prefix. */
  def mentionId(convId: String, turnIdx: Int, begin: Int): String =
    f"$convId%s:$turnIdx%06d:$begin%06d"
}
