package graft.sources

import graft.functions.MinHash
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic transcript corpus (seed-pure, no wall clock, no
  * RNG state shared across rows) — the sandbox stand-in for the Iceberg
  * transcript table named by BASELINE.json::input_hint, plus the golden
  * labels (FIXTURES.md B1/B2/B4): every generated mention knows its gold
  * entity, so pairwise F1 vs gold clusters is computable exactly.
  *
  * Reference analogue: REL's AIDA-CoNLL gold mention fixtures
  * (generate_train_test.py::GenTrainingTest [M], SURVEY.md D8) re-expressed
  * as cluster assignments over transcript turns.
  *
  * Every per-row value derives from splitmix64 of (seed, convId, turnIdx,
  * slot) — generation is embarrassingly parallel via spark.range().flatMap
  * and identical at any parallelism level (required for the N-vs-4N
  * scaling run to be apples-to-apples).
  */
object TranscriptGen {

  case class GenConfig(
      nEntities: Int = 500,
      nConvs: Int = 2000,
      minTurns: Int = 3,
      maxTurns: Int = 10,
      zipfS: Double = 1.2,
      ambiguousPairs: Int = 5, // entity pairs sharing an ambiguous surface
      mentionProb: Double = 0.6, // fraction of turns carrying a mention
      // Odd-index entities get NO abbreviated dictionary entry; their bare
      // base name only ever appears as a follow-up AFTER a canonical
      // mention in the same conversation, so it is undetectable by the
      // dictionary and must ride coref candidate-inheritance into the
      // clusters (REL with_coref semantics; FIXTURES.md B4 analogue).
      corefFollowups: Boolean = true,
      seed: Long = 42L)

  case class GoldMention(conv_id: String, turn_idx: Int, begin: Int, end: Int,
                         surface: String, entity: String)

  // ---- deterministic hashing utilities ----
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def mix(parts: Long*): Long = parts.foldLeft(0x51ab5f3de9e2c1a7L)((a, p) => splitmix64(a ^ p))
  private def uniform(h: Long): Double = ((h >>> 11).toDouble / (1L << 53).toDouble)
  private def pick(h: Long, n: Int): Int = ((h >>> 8) % n.toLong).toInt.abs

  // ---- vocabulary (namespaces deliberately disjoint so filler / topic
  // tokens can never collide with dictionary surface forms) ----
  private val Syllables: Array[String] = {
    val cons = "bdfgklmnprstvz"
    val vow = "aeiou"
    (for (c <- cons; v <- vow) yield s"$c$v").toArray // 70 syllables
  }
  private val TypeWords = Array("corp", "labs", "systems", "group", "holdings")
  private val Fillers = Array(
    "please", "check", "status", "update", "order", "ticket", "issue",
    "thanks", "need", "info", "about", "regarding", "latest", "report",
    "meeting", "schedule", "review", "send", "details", "follow")

  /** Unique base name of entity i: 2 random-looking syllables + 2 syllables
    * that encode i (guaranteeing uniqueness and ≥2-char separation). */
  def entityBaseName(i: Int, seed: Long): String = {
    val h = mix(seed, 0x11L, i.toLong)
    val s1 = Syllables(pick(h, Syllables.length))
    val s2 = Syllables(pick(splitmix64(h), Syllables.length))
    val e1 = Syllables(i % Syllables.length)
    val e2 = Syllables((i / Syllables.length) % Syllables.length)
    s"$s1$s2$e1$e2"
  }

  def entityId(i: Int): String = f"e$i%05d"

  /** Canonical two-token surface "name type". */
  def canonicalSurface(i: Int, seed: Long): String = {
    val h = mix(seed, 0x22L, i.toLong)
    s"${entityBaseName(i, seed)} ${TypeWords(pick(h, TypeWords.length))}"
  }

  /** Deterministic typo in the base name (adjacent-char swap). */
  def typoSurface(i: Int, seed: Long): String = {
    val c = canonicalSurface(i, seed)
    val Array(name, tpe) = c.split(" ")
    val h = mix(seed, 0x33L, i.toLong)
    val p = 1 + pick(h, name.length - 2)
    val chars = name.toCharArray
    val t = chars(p); chars(p) = chars(p + 1); chars(p + 1) = t
    s"${new String(chars)} $tpe"
  }

  /** Abbreviated surface: base name alone (unigram). */
  def abbrevSurface(i: Int, seed: Long): String = entityBaseName(i, seed)

  /** Ambiguous surface shared by entity pair k = (2k, 2k+1). */
  def ambiguousSurface(k: Int, seed: Long): String = {
    val h = mix(seed, 0x44L, k.toLong)
    "zz" + Syllables(pick(h, Syllables.length)) + Syllables(pick(splitmix64(h), Syllables.length))
  }

  /** Topic tokens of entity i (context signal for disambiguation; prefixed
    * "q" — a namespace no other token uses). */
  def topicTokens(i: Int, seed: Long): Array[String] =
    Array.tabulate(5) { j =>
      val h = mix(seed, 0x55L, i.toLong, j.toLong)
      "q" + Syllables(pick(h, Syllables.length)) + Syllables(pick(splitmix64(h), Syllables.length)) + ('a' + (i % 26)).toChar + ('a' + (j % 26)).toChar
    }

  /** True iff entity i's abbreviated surface has its own dictionary
    * entry. Odd entities are the coref fixtures: their bare base name is
    * OUT of dictionary and reaches the clusters only via candidate
    * inheritance from an earlier canonical mention. */
  def abbrevInDict(cfg: GenConfig, i: Int): Boolean =
    !cfg.corefFollowups || i % 2 == 0

  /** The p(e|m) prior dictionary for this corpus (FIXTURES.md B2). */
  def dictEntries(cfg: GenConfig): Seq[DictEntry] = {
    val base = (0 until cfg.nEntities).flatMap { i =>
      val e = entityId(i)
      Seq(
        DictEntry(canonicalSurface(i, cfg.seed), canonicalSurface(i, cfg.seed), 1000,
                  Array(Candidate(e, 1.0))),
        DictEntry(typoSurface(i, cfg.seed), typoSurface(i, cfg.seed), 10,
                  Array(Candidate(e, 1.0)))) ++
      (if (abbrevInDict(cfg, i))
         Seq(DictEntry(abbrevSurface(i, cfg.seed), abbrevSurface(i, cfg.seed), 300,
                       Array(Candidate(e, 1.0))))
       else Seq.empty)
    }
    val amb = (0 until cfg.ambiguousPairs).map { k =>
      val s = ambiguousSurface(k, cfg.seed)
      DictEntry(s, s, 500, Array(
        Candidate(entityId(2 * k), 0.7),
        Candidate(entityId(2 * k + 1), 0.3)))
    }
    // dedupe (typo could in principle collide with another canonical —
    // keep first occurrence; collisions are vanishingly rare by namespace)
    (base ++ amb).groupBy(_.mention).map(_._2.head).toSeq.sortBy(_.mention)
  }

  def dict(cfg: GenConfig): Map[String, DictEntry] =
    dictEntries(cfg).map(d => d.mention -> d).toMap

  /** Entity context vectors: mean hash embedding of the entity's topic
    * tokens (the ED dimension table, SURVEY.md D4 analogue). */
  def entityVectors(cfg: GenConfig, dim: Int): Map[String, Array[Float]] =
    (0 until cfg.nEntities).map { i =>
      entityId(i) -> MinHash.meanEmbedding(topicTokens(i, cfg.seed).toSeq, dim)
    }.toMap

  // Zipf CDF over entities (hot heads exercise salting; north_rule).
  private def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1, s))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }
  private def sampleZipf(cdf: Array[Double], u: Double): Int = {
    val idx = java.util.Arrays.binarySearch(cdf, u)
    val i = if (idx >= 0) idx else -idx - 1
    math.min(i, cdf.length - 1)
  }

  /** One conversation's turns + gold mentions, purely from (cfg, convIdx). */
  def genConv(cfg: GenConfig, convIdx: Long): (Seq[Turn], Seq[GoldMention]) = {
    val convId = f"c$convIdx%08d"
    val cdf = cdfCache(cfg)
    val nTurns = cfg.minTurns + pick(mix(cfg.seed, 0x66L, convIdx), cfg.maxTurns - cfg.minTurns + 1)
    val roles = Array("user", "assistant", "tool")
    val turns = scala.collection.mutable.ArrayBuffer.empty[Turn]
    val golds = scala.collection.mutable.ArrayBuffer.empty[GoldMention]
    // entities whose CANONICAL surface was emitted in an earlier turn of
    // this conversation — the only valid antecedents for a dict-absent
    // abbreviated follow-up (the bare base name is a word-run of the
    // canonical surface, so coref inheritance is guaranteed to bind it)
    val canonicalSeen = scala.collection.mutable.HashSet.empty[Int]
    var t = 0
    while (t < nTurns) {
      val hTurn = mix(cfg.seed, 0x77L, convIdx, t.toLong)
      val hasMention = uniform(splitmix64(hTurn ^ 1)) < cfg.mentionProb
      // realistic transcript-turn lengths (~20-50 tokens); topic tokens sit
      // immediately before the mention so the ±CtxWindow local context
      // carries the disambiguation signal regardless of padding length
      val nFillPre = 8 + pick(splitmix64(hTurn ^ 2), 16)
      val nFillPost = 6 + pick(splitmix64(hTurn ^ 3), 12)
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      var f = 0
      while (f < nFillPre) {
        toks += Fillers(pick(mix(hTurn, 0x88L, f.toLong), Fillers.length)); f += 1
      }
      if (hasMention) {
        val ei = sampleZipf(cdf, uniform(splitmix64(hTurn ^ 4)))
        // topic context tokens of the gold entity (the local-context
        // signal): 3 DISTINCT tokens via rotation so the context embedding
        // separates candidate entities reliably
        val tt = topicTokens(ei, cfg.seed)
        val start = pick(mix(hTurn, 0x99L, 0L), tt.length)
        var k = 0
        val nTopic = 3
        while (k < nTopic) {
          toks += tt((start + k) % tt.length); k += 1
        }
        // surface variant: canonical 55%, cased 15%, typo 15%, abbrev,
        // or (for ambiguous-pair entities) the shared ambiguous surface
        val u = uniform(splitmix64(hTurn ^ 5))
        val isAmbEntity = ei < 2 * cfg.ambiguousPairs
        val surfaceLower =
          if (isAmbEntity && u < 0.30) ambiguousSurface(ei / 2, cfg.seed)
          else if (u < 0.55) canonicalSurface(ei, cfg.seed)
          else if (u < 0.70) canonicalSurface(ei, cfg.seed) // cased in raw text
          else if (u < 0.85) typoSurface(ei, cfg.seed)
          // dict-absent abbrev needs an in-conversation canonical
          // antecedent for coref to inherit from; without one fall back
          // to the canonical surface (an isolated bare name would be
          // unlinkable by ANY with_coref-style system)
          else if (abbrevInDict(cfg, ei) || canonicalSeen(ei)) abbrevSurface(ei, cfg.seed)
          else canonicalSurface(ei, cfg.seed)
        val cased = u >= 0.55 && u < 0.70
        if (surfaceLower == canonicalSurface(ei, cfg.seed)) canonicalSeen += ei
        val surfaceRaw =
          if (cased) surfaceLower.split(" ").map(_.capitalize).mkString(" ")
          else surfaceLower
        val begin = toks.length
        val mtoks = surfaceRaw.split(" ")
        toks ++= mtoks
        golds += GoldMention(convId, t, begin, begin + mtoks.length,
                             surfaceLower, entityId(ei))
        // trailing topic tokens — the local context is topic-dense on
        // both sides of the mention, like an entity-bearing utterance
        toks += tt((start + 3) % tt.length)
        toks += tt((start + 4) % tt.length)
      }
      f = 0
      while (f < nFillPost) {
        toks += Fillers(pick(mix(hTurn, 0xaaL, f.toLong), Fillers.length)); f += 1
      }
      val role = roles(t % roles.length)
      val tool = if (role == "tool") "search" else null
      val ts = new java.sql.Timestamp(1704067200000L + convIdx * 600000L + t * 30000L)
      turns += Turn(convId, t, role, toks.mkString(" "), tool, ts)
      t += 1
    }
    (turns.toSeq, golds.toSeq)
  }

  // per-config CDF cache (computed once per executor, deterministic)
  @transient private lazy val cdfCacheMap =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double), Array[Double]]()
  private def cdfCache(cfg: GenConfig): Array[Double] =
    cdfCacheMap.computeIfAbsent((cfg.nEntities, cfg.zipfS),
      _ => zipfCdf(cfg.nEntities, cfg.zipfS))

  /** Distributed transcript table. */
  def transcripts(spark: SparkSession, cfg: GenConfig): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, cfg.nConvs.toLong, 1,
        math.min(cfg.nConvs, spark.sparkContext.defaultParallelism * 4))
      .flatMap(c => genConv(cfg, c)._1)
  }

  /** Distributed gold mention table. */
  def goldMentions(spark: SparkSession, cfg: GenConfig): Dataset[GoldMention] = {
    import spark.implicits._
    spark.range(0, cfg.nConvs.toLong, 1,
        math.min(cfg.nConvs, spark.sparkContext.defaultParallelism * 4))
      .flatMap(c => genConv(cfg, c)._2)
  }
}
