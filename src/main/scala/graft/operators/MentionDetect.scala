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
  // REL's get_ctxt uses ±100 words over document text [M]; transcript
  // turns are short and topic-dense, so a tight local window keeps the
  // context embedding informative instead of averaging in the whole turn.
  val CtxWindow = 4
  val CtxDim = 32           // hash-embedding dim for context vectors

  private val TokenRe = java.util.regex.Pattern.compile(TextFns.TokenPattern)

  def tokenize(text: String): Array[String] = {
    val m = TokenRe.matcher(text.toLowerCase)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  /** Per-executor index: first token of a dictionary surface → bitmask of
    * entry lengths starting with it (bit n-1 = an n-token entry exists).
    * Lets `detect` skip the n-gram join+probe for the overwhelming
    * majority of positions (one array read instead of a string build +
    * hash probe per (position, size)). Cached per broadcast id. */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Map[String, Int]]()

  def firstTokenMasks(dict: Dict): Map[String, Int] =
    dict.keysIterator.foldLeft(Map.empty[String, Int]) { (acc, surface) =>
      val sp = surface.indexOf(' ')
      val first = if (sp < 0) surface else surface.substring(0, sp)
      val n = surface.count(_ == ' ') + 1
      if (n > MaxNgram) acc
      else acc.updated(first, acc.getOrElse(first, 0) | (1 << (n - 1)))
    }

  private def cachedMasks(dict: Dict, cacheKey: Long): Map[String, Int] =
    indexCache.computeIfAbsent(cacheKey, _ => firstTokenMasks(dict))

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
    * longer n-grams win, then leftmost-first. `masks` (first-token →
    * length bitmask) prunes probes; pass None to build it ad hoc. */
  def detect(tokens: Array[String], dict: Dict,
             masksOpt: Option[Map[String, Int]] = None): List[Span] = {
    val masks = masksOpt.getOrElse(firstTokenMasks(dict))
    val n = tokens.length
    // per-position length mask, one hash probe per token
    val posMask = new Array[Int](n)
    var p = 0
    while (p < n) { posMask(p) = masks.getOrElse(tokens(p), 0); p += 1 }
    val taken = new Array[Boolean](n)
    val out = scala.collection.mutable.ListBuffer.empty[Span]
    var size = math.min(MaxNgram, n)    // REL Cmns: longest n first
    while (size >= 1) {
      val bit = 1 << (size - 1)
      var i = 0
      while (i + size <= n) {
        if ((posMask(i) & bit) != 0) {
          var free = true
          var j = i
          while (j < i + size) { if (taken(j)) free = false; j += 1 }
          if (free) {
            val surface =
              if (size == 1) tokens(i)
              else {
                val sb = new java.lang.StringBuilder(tokens(i))
                var k = i + 1
                while (k < i + size) { sb.append(' ').append(tokens(k)); k += 1 }
                sb.toString
              }
            dict.get(surface) match {
              case Some(entry) =>
                out += Span(i, i + size, surface, entry)
                j = i
                while (j < i + size) { taken(j) = true; j += 1 }
                i += size - 1
              case None =>
            }
          }
        }
        i += 1
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
                     entityVec: String => Array[Float],
                     masks: Option[Map[String, Int]] = None): Seq[Mention] = {
    val toks = tokenize(if (t.text == null) "" else t.text)
    detect(toks, dict, masks).map { s =>
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
    val bcId = dictBc.id
    turns.mapPartitions { it =>
      val dict = dictBc.value
      val masks = Some(cachedMasks(dict, bcId))
      val ev: String => Array[Float] =
        e => entityVecBc.value.getOrElse(e, Array.empty[Float])
      it.flatMap(t => mentionsOfTurn(t, dict, ev, masks))
    }
  }
}
