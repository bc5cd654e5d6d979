package graft.operators

import graft.functions.{MinHash, StringSim, TextFns}
import graft.model._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Greedy longest-match n-gram mention detection — the Spark re-expression
  * of REL's md-free Cmns tagger (`src/REL/ner/cmns.py::Cmns.predict`,
  * SURVEY.md §2.5 [M]): n-grams n=5→1 per unit, keep those present in the
  * p(e|m) dictionary, greedy non-overlapping longest-first, left-to-right.
  *
  * The whole detector is a pure per-row function over the token array
  * (ordered logic stays inside one row), so it is embarrassingly parallel,
  * deterministic across any partitioning, and runs as a typed flatMap with
  * a broadcast dictionary — the REL SQLite point-lookup becomes a broadcast
  * hash-map probe (SURVEY.md §2.3 row 1).
  */
object MentionDetect {

  /** Broadcast dictionary: normalized surface form → entry. */
  type Dict = Map[String, DictEntry]

  val MaxNgram = 5          // REL Cmns n=5..1 [M]
  val CtxWindow = 100       // REL get_ctxt ±100 words [M]
  val CtxDim = 32           // hash-embedding dim for context vectors

  def tokenize(text: String): Array[String] =
    TextFns.TokenPattern.r.findAllIn(text.toLowerCase).toArray

  /** REL-style case-normalization cascade (preprocess_mention [M]):
    * try the exact form, then the recased phrase, then the lowercase
    * alias; among forms present in the dictionary pick the most frequent.
    * Our dictionary keys are lowercase, so for already-lower tokens this
    * is the identity — the cascade matters for raw (cased) surfaces. */
  def normalizeMention(raw: String, dict: Dict): Option[String] = {
    val lower = raw.toLowerCase
    val recased = modifyUppercasePhrase(raw)
    val forms = Seq(raw, recased, lower).distinct
    val present = forms.filter(dict.contains)
    if (present.isEmpty) None
    else Some(present.maxBy(f => (dict(f).freq, f)))
  }

  /** REL utils.py::modify_uppercase_phrase [M]: ALL-CAPS phrases are
    * recased to Title Case; mixed-case strings pass through. */
  def modifyUppercasePhrase(s: String): String =
    if (s.nonEmpty && s == s.toUpperCase && s.exists(_.isLetter))
      s.split(" ").map(w =>
        if (w.isEmpty) w else w.charAt(0).toUpper + w.substring(1).toLowerCase)
        .mkString(" ")
    else s

  /** Detected span: token [begin, end) + dictionary entry. */
  final case class Span(begin: Int, end: Int, surface: String, entry: DictEntry)

  /** Greedy longest-match detection over a token array. Deterministic:
    * longer n-grams win, then leftmost-first. */
  def detect(tokens: Array[String], dict: Dict): List[Span] = {
    val n = tokens.length
    val taken = new Array[Boolean](n)
    val out = scala.collection.mutable.ListBuffer.empty[Span]
    var size = math.min(MaxNgram, n)
    while (size >= 1) {
      var i = 0
      while (i + size <= n) {
        var free = true
        var j = i
        while (j < i + size) { if (taken(j)) free = false; j += 1 }
        if (free) {
          val surface = tokens.slice(i, i + size).mkString(" ")
          dict.get(surface) match {
            case Some(entry) =>
              out += Span(i, i + size, surface, entry)
              j = i
              while (j < i + size) { taken(j) = true; j += 1 }
              i += size
            case None => i += 1
          }
        } else i += 1
      }
      size -= 1
    }
    out.sortBy(s => (s.begin, s.end)).toList
  }

  /** Context tokens: up to `CtxWindow` tokens left + right of the span,
    * excluding the mention tokens themselves (REL get_ctxt analogue). */
  def contextTokens(tokens: Array[String], begin: Int, end: Int): Array[String] = {
    val lo = math.max(0, begin - CtxWindow)
    val hi = math.min(tokens.length, end + CtxWindow)
    val out = new Array[String](begin - lo + hi - end)
    var k = 0
    var i = lo
    while (i < begin) { out(k) = tokens(i); k += 1; i += 1 }
    i = end
    while (i < hi) { out(k) = tokens(i); k += 1; i += 1 }
    out
  }

  /** Entity disambiguation for one mention: argmax over candidates of
    * `w_p * prior + w_c * cosine(ctx, entityVec)` — the linear analogue of
    * REL's prior ⊕ local-context scoring (entity_disambiguation.py::predict
    * path, SURVEY.md §3 E1). Entity vectors are deterministic hash
    * embeddings of the entity id's topic tokens (see EntityVectors).
    *
    * Returns (entity, confidence margin): margin = top1 − top2 score
    * (1.0 for a single candidate) — the analogue of REL's LR confidence.
    * Low-margin resolutions must not bridge clusters (Scoring gates the
    * ED-agreement feature on this margin). */
  def resolve(cands: Array[Candidate], ctx: Array[Float],
              entityVec: String => Array[Float],
              wPrior: Double = 0.2, wCtx: Double = 0.8): (String, Double) = {
    if (cands.isEmpty) return ("", 0.0)
    var best = ""; var bestScore = Double.NegativeInfinity
    var second = Double.NegativeInfinity
    val ctxD = ctx.map(_.toDouble)
    var i = 0
    while (i < cands.length) {
      val c = cands(i)
      val ev = entityVec(c.entity)
      val cos = if (ev.isEmpty || ctx.isEmpty) 0.0
                else StringSim.cosine(ctxD, ev.map(_.toDouble))
      val s = wPrior * c.prior + wCtx * cos
      if (s > bestScore || (s == bestScore && c.entity < best)) {
        second = bestScore; best = c.entity; bestScore = s
      } else if (s > second) second = s
      i += 1
    }
    val margin = if (cands.length == 1) 1.0 else bestScore - second
    (best, margin)
  }

  /** Full per-turn mention extraction: tokenize → detect → normalize →
    * context embed → resolve. Pure; maps a Turn to its Mentions. */
  def mentionsOfTurn(t: Turn, dict: Dict,
                     entityVec: String => Array[Float]): Seq[Mention] = {
    val toks = tokenize(if (t.text == null) "" else t.text)
    detect(toks, dict).map { s =>
      val ctxToks = contextTokens(toks, s.begin, s.end)
      val ctx = MinHash.meanEmbedding(ctxToks, CtxDim)
      val (resolved, score) = resolve(s.entry.candidates, ctx, entityVec)
      Mention(Ids.mentionId(t.conv_id, t.turn_idx, s.begin),
              t.conv_id, t.turn_idx, s.begin, s.end, s.surface,
              s.entry.mention, s.entry.candidates, ctx, resolved, score)
    }
  }

  /** Distributed detection: typed flatMap with a broadcast dictionary.
    * Map-only — zero shuffles (SURVEY.md §3 Stage A). */
  def run(turns: Dataset[Turn], dictBc: Broadcast[Dict],
          entityVecBc: Broadcast[Map[String, Array[Float]]]): Dataset[Mention] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.flatMap { t =>
      val ev: String => Array[Float] =
        e => entityVecBc.value.getOrElse(e, Array.empty[Float])
      mentionsOfTurn(t, dictBc.value, ev)
    }
  }
}
