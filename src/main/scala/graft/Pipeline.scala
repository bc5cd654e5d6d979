package graft

import graft.model._
import graft.operators._
import graft.sources.{TableIO, TranscriptGen}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end ER pipeline: block → score → cluster (SURVEY.md §3).
  *
  * Stage A (map-only): detect mentions per turn with the broadcast p(e|m)
  *   dictionary, embed context, resolve (ED), derive blocking keys.
  * Stage B (1 shuffle + salted hot path): candidate pairs via self-join on
  *   block_key, pure-column pairwise features, threshold → edges.
  * Stage C (2 shuffles/round): large-star/small-star connected components.
  * Stage D: attach singletons, emit (mention, cluster_id).
  */
object Pipeline {

  case class Config(
      lsh: Blocking.LshConfig = Blocking.LshConfig(),
      score: Scoring.ScoreConfig = Scoring.ScoreConfig(),
      tau: Int = 512,
      blockMaxSize: Int = 10000000,
      starThreshold: Int = 2048,
      starK: Int = 3,
      ccMaxIter: Int = 50,
      supernode: Boolean = true,
      coref: Boolean = true,
      // one-shuffle mention stage (detect+inherit in one conv group) vs
      // the round-3 two-pass shape (map-only detect persisted + cogroup);
      // property-equal outputs — the flag exists so StageProfile can A/B
      // the two shapes' scaling. Default: one-shot (fewer shuffles, no
      // detected-mention materialization).
      corefOneShot: Boolean = true)

  def mentions(turns: Dataset[Turn],
               dictBc: Broadcast[Map[String, DictEntry]],
               vecsBc: Broadcast[Map[String, Array[Float]]]): Dataset[Mention] =
    MentionDetect.run(turns, dictBc, vecsBc)

  /** Flagship mention universe: detected ∪ coref-inherited (REL
    * with_coref — SURVEY §2.3 "union with the detected set downstream").
    * Inherited mentions occupy token positions detection left uncovered,
    * so the union is id-disjoint by construction.
    *
    * Default shape (corefOneShot): ONE shuffle of the slim turn table;
    * detection and inheritance run together per conversation group
    * (Coref.detectAndInherit). The legacy two-pass shape (map-only
    * detection persisted + a turns⋈mentions cogroup + union) is kept
    * behind the flag for A/B profiling; the two are property-equal
    * (PipelineSpec). */
  def allMentions(turns: Dataset[Turn],
                  dictBc: Broadcast[Map[String, DictEntry]],
                  vecsBc: Broadcast[Map[String, Array[Float]]],
                  cfg: Config = Config()): Dataset[Mention] = {
    if (!cfg.coref) mentions(turns, dictBc, vecsBc)
    else if (cfg.corefOneShot) Coref.detectAndInherit(turns, dictBc, vecsBc)
    else {
      val det = CacheTracker.register(
        mentions(turns, dictBc, vecsBc)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      det.unionByName(Coref.inherited(turns, det, dictBc, vecsBc))
    }
  }

  /** mentions → (mention_id, conv_id, turn_idx, begin, end, surface, norm,
    * resolved, cluster_id). Singleton mentions keep their own id.
    *
    * Supernode collapse (cfg.supernode): mentions with identical
    * (norm, resolved) and a confident ED margin are guaranteed to score
    * above the edge threshold pairwise (jw = lev = 1, agree = 1 ⇒ score ≥
    * wJw + wLev + wAgree + wPrior·p_top − wCos ≥ threshold for the default
    * weights), so pairing inside such a group is pure O(n²) waste. Only
    * one representative (min id) per group enters blocking/scoring; group
    * members attach through direct member→rep edges. This turns the
    * same-entity clique volume (quadratic in corpus size — fatal at 10^12
    * turns where a hot surface has 10^8 identical mentions) into linear
    * pre-edges. Low-margin mentions are never collapsed. */
  def cluster(ms: Dataset[Mention], cfg: Config = Config()): DataFrame =
    CacheTracker.scoped { // per-run registry: concurrent runs can't drain each other
      // The mention set feeds 4+ downstream consumers (supernode grouping,
      // scoring-set anti-filter, payload attach, final assignment join) —
      // persist it or the detection flatMap (tokenize + greedy match +
      // context embed + ED) re-executes once per consumer. In production
      // this is the stage-A checkpoint table (runCheckpointed).
      import org.apache.spark.storage.StorageLevel
      val msP = CacheTracker.register(ms.persist(StorageLevel.MEMORY_AND_DISK))
      val (scoringMs0, memberEdges) =
        if (cfg.supernode) supernodeCollapse(msP, cfg) else (msP, None)
      val scoringMs = CacheTracker.register(scoringMs0.persist(StorageLevel.MEMORY_AND_DISK))
      val keyed = Blocking.withBlockKeys(scoringMs, cfg.lsh)
      val pairIds = Blocking.candidatePairs(keyed, cfg.tau, cfg.blockMaxSize,
                                            cfg.starThreshold, cfg.starK)
      val scored = Scoring.edges(Blocking.attachPayload(pairIds, scoringMs), cfg.score)
      // Materialize the assignment (localCheckpoint is the in-memory analogue
      // of the stage table runCheckpointed writes), then release every
      // intermediate cache — callers get a self-contained frame and repeated
      // cluster() calls in one session no longer accumulate cached blocks.
      val out = assemble(msP.toDF(), scored, memberEdges, cfg).localCheckpoint(true)
      CacheTracker.drainUnpersist()
      out
    }

  /** CC over the SCORING graph only (representatives + low-margin
    * mentions — size ∝ distinct surface forms, not corpus rows), then a
    * single join attaches supernode members to their rep's cluster.
    * Because members sort after their rep (rep = group min), the
    * component min over scoring nodes is the global min — cluster ids
    * stay min-member. */
  private def assemble(msDf: DataFrame, scored: DataFrame,
                       memberEdges: Option[DataFrame], cfg: Config): DataFrame = {
    val assign = Clustering.connectedComponents(scored, cfg.ccMaxIter)
    val full = memberEdges match {
      case Some(me) =>
        val memberAssign = me
          .select(col("src").as("rep_id"), col("dst").as("member_id"))
          .join(assign, col("rep_id") === col("node"), "left")
          .select(col("member_id").as("node"),
                  coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
        assign.unionByName(memberAssign)
      case None => assign
    }
    msDf
      .join(full, msDf("mention_id") === full("node"), "left")
      .select(col("mention_id"), col("conv_id"), col("turn_idx"), col("begin"),
              col("end"), col("surface"), col("norm"), col("resolved"),
              coalesce(col("cluster_id"), col("mention_id")).as("cluster_id"))
  }

  /** Split mentions into (scoring set = representatives + low-margin
    * mentions, member→rep pre-edges).
    *
    * Shuffle discipline: the full Mention payload (context vector +
    * candidate list) never crosses a shuffle here. Grouping and the
    * member-edge join run on a 4-column slim projection (a hot surface
    * form is ~13% of all rows — shipping payloads through that key was
    * measured as THE pipeline bottleneck), and the scoring set is carved
    * out of the payload table with a broadcast semi-join on the (small)
    * representative + low-margin id set — map-only. */
  private def supernodeCollapse(ms: Dataset[Mention], cfg: Config)
      : (Dataset[Mention], Option[DataFrame]) = {
    val spark = ms.sparkSession
    import spark.implicits._
    val msDf = ms.toDF()
    val slim = msDf.select(col("mention_id"), col("norm"), col("resolved"),
                           col("resolvedScore"))
    val isEligible =
      col("resolved") =!= "" && col("resolvedScore") >= cfg.score.minMargin
    val eligible = slim.where(isEligible)
    // map-side partial min per (norm, resolved): no skew exposure
    val reps = eligible.groupBy("norm", "resolved")
      .agg(min("mention_id").as("rep_id"))
    val withRep = eligible.join(reps, Seq("norm", "resolved"))
    val memberEdges = withRep.where(col("mention_id") =!= col("rep_id"))
      .select(col("rep_id").as("src"), col("mention_id").as("dst"))
    val scoringIds = CacheTracker.register(
      reps.select(col("rep_id").as("mention_id"))
        .unionByName(slim.where(!isEligible).select(col("mention_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // broadcast the id set when it is broadcast-sized (the normal case:
    // #distinct surfaces + low-margin tail); degrade to a shuffled
    // semi-join on the uniform mention_id key otherwise. Cutoff 1M rows:
    // mention ids are ~25-byte strings, so 1M ≈ 25-50 MB serialized —
    // comfortably under executor broadcast budgets; 5M (round 1) risked
    // a 100-300 MB broadcast per executor.
    val idRows = scoringIds.count()
    val idSide = if (idRows <= 1000000L) broadcast(scoringIds) else scoringIds
    val scoringMs = msDf
      .join(idSide, Seq("mention_id"), "left_semi")
      .as[Mention]
    (scoringMs, Some(memberEdges))
  }

  /** Full run from raw turns: detect (∪ coref-inherit) → cluster. */
  def run(turns: Dataset[Turn],
          dict: Map[String, DictEntry],
          vecs: Map[String, Array[Float]],
          cfg: Config = Config()): DataFrame = CacheTracker.scoped {
    val sc = turns.sparkSession.sparkContext
    val out = cluster(allMentions(turns, sc.broadcast(dict), sc.broadcast(vecs), cfg), cfg)
    // cluster() localCheckpoints its output — the detected-mention persist
    // registered by allMentions in THIS scope can go now
    CacheTracker.drainUnpersist()
    out
  }

  /** Full flagship run with BOTH reference dimension tables DISTRIBUTED —
    * the 100-TB configuration (round-3 VERDICT task 1): a REL-scale
    * p(e|m) dictionary (~10M surfaces × top-K candidates, several GB) and
    * a Wikipedia2Vec-scale entity-vector table (tens of GB) can live in
    * neither a driver Map nor an executor broadcast. No driver Map
    * appears anywhere in this path:
    *
    *  - mention universe (detected ∪ coref-inherited) via
    *    Coref.detectAndInheritJoined — Bloom-prefiltered candidate
    *    explode, dictionary equi-join, per-conversation mini-dictionaries
    *    (exact, not approximate — see its Scaladoc);
    *  - entity disambiguation via MentionDetect.resolveJoined — candidate
    *    explode against the vector dimension table, identical `resolve`
    *    on the gathered vectors;
    *  - then the same block → score → cluster stages as [[run]].
    *
    * Property-equal to the broadcast flagship on the same inputs
    * (JoinedDetectSpec: cluster-for-cluster, incl. coref fixtures).
    *
    * `vecDf` schema: (entity: string, vec: array<float>). Pass
    * `expectedDictKeys` to skip the Bloom-sizing count scan. */
  def runJoined(turns: Dataset[Turn],
                dictDf: Dataset[DictEntry],
                vecDf: DataFrame,
                cfg: Config = Config(),
                expectedDictKeys: Long = 0L,
                bloomFpp: Double = 0.01): DataFrame = CacheTracker.scoped {
    val ms0 =
      if (cfg.coref)
        Coref.detectAndInheritJoined(turns, dictDf, expectedDictKeys, bloomFpp)
      else
        MentionDetect.runJoined(turns, dictDf,
          turns.sparkSession.sparkContext.broadcast(Map.empty[String, Array[Float]]),
          expectedDictKeys, bloomFpp)
    val out = cluster(MentionDetect.resolveJoined(ms0, vecDf), cfg)
    CacheTracker.drainUnpersist()
    out
  }

  /** One incremental update's outputs: the delta mention table, the newly
    * scored edges (both ready to APPEND to the base stage tables — Iceberg
    * append in production), and the updated full clustering. */
  case class Increment(deltaMentions: DataFrame, newEdges: DataFrame,
                       clusters: DataFrame)

  /** Append-only INCREMENTAL maintenance of a clustered corpus — the
    * operation a 10¹²-turn deployment actually runs every ingestion
    * cycle: `newTurns` arrive and the update must cost O(delta) pair
    * work, never a from-scratch re-score of the historical corpus.
    *
    * Mechanics (pair generation and scoring ∝ delta; the only
    * full-corpus passes are LINEAR slim-projection scans):
    *
    *  1. detect ∪ coref-inherit mentions of the new turns only;
    *  2. supernode grouping + block keys recomputed over old ∪ new —
    *     linear map/group work, no pairing; a new mention joining an
    *     existing surface group attaches via its member edge;
    *  3. candidate pairs are generated ONLY inside blocks containing at
    *     least one new mention (semi-join on the delta's block keys) and
    *     then restricted to pairs touching a new mention — historical
    *     pairs were scored by the base run and their edges are reused
    *     verbatim;
    *  4. connected components over base edges ∪ new edges ∪ fresh member
    *     edges; cluster ids stay min-member.
    *
    * Semantics: EDGES ARE APPEND-ONLY — a pair once matched stays
    * matched even if a later increment changes which representative
    * would have been scored (the production-desirable behavior: clusters
    * never flap when data is appended, they only merge). On corpora
    * where the scorer separates entities cleanly (the F1 fixtures) the
    * result is EXACTLY the from-scratch clustering — property-tested in
    * IncrementalSpec across conversation-disjoint splits and chained
    * increments. Increments must be conversation-complete: coref
    * inheritance reaches only within the increment's own turns, so route
    * a conversation's late turns into the same increment (or re-feed the
    * conversation whole).
    *
    * `baseMentions`/`baseScoredEdges` are the previous run's tables
    * ([[runCheckpointed]]'s `mentions` stage and the `kind='scored'`
    * rows of its `edges` stage, or [[scoredEdges]] for a bootstrap). */
  def runIncremental(newTurns: Dataset[Turn],
                     dict: Map[String, DictEntry],
                     vecs: Map[String, Array[Float]],
                     baseMentions: DataFrame,
                     baseScoredEdges: DataFrame,
                     cfg: Config = Config()): Increment = CacheTracker.scoped {
    val spark = newTurns.sparkSession
    import org.apache.spark.storage.StorageLevel
    val sc = spark.sparkContext
    val deltaMs = CacheTracker.register(
      allMentions(newTurns, sc.broadcast(dict), sc.broadcast(vecs), cfg)
        .toDF().persist(StorageLevel.MEMORY_AND_DISK))
    val (allMs, memberEdges, newEdges0) = incrementParts(baseMentions, deltaMs, cfg)
    val newEdges = newEdges0.localCheckpoint(true)
    val allScored = baseScoredEdges.unionByName(newEdges)
      .dropDuplicates("src", "dst")
    val out = assemble(allMs.toDF(), allScored, memberEdges, cfg)
      .localCheckpoint(true)
    val deltaOut = deltaMs.localCheckpoint(true)
    CacheTracker.drainUnpersist()
    Increment(deltaOut, newEdges, out)
  }

  /** [[runIncremental]] with resumable stage tables (north_rule
    * resumability for the maintenance path too): the delta mention table,
    * the new-edge table, and the updated clusters each land in
    * `$root/<stage>` with a fingerprint manifest — a killed increment
    * redoes only unfinished stages, and a completed one is a pure read.
    * The emitted `mentions_delta`/`edges_delta` tables are exactly what
    * the caller appends to the base tables before the NEXT increment. */
  def runIncrementalCheckpointed(newTurns: Dataset[Turn],
                                 dict: Map[String, DictEntry],
                                 vecs: Map[String, Array[Float]],
                                 baseMentions: DataFrame,
                                 baseScoredEdges: DataFrame,
                                 root: String,
                                 fingerprint: String,
                                 cfg: Config = Config()): DataFrame = CacheTracker.scoped {
    val spark = newTurns.sparkSession
    val sc = spark.sparkContext
    val deltaMs = TableIO.stage(spark, "mentions_delta",
        s"$root/mentions_delta", fingerprint) {
      allMentions(newTurns, sc.broadcast(dict), sc.broadcast(vecs), cfg).toDF()
    }
    val newEdges = TableIO.stage(spark, "edges_delta",
        s"$root/edges_delta", fingerprint) {
      incrementParts(baseMentions, deltaMs, cfg)._3
    }
    val out = TableIO.stage(spark, "clusters", s"$root/clusters", fingerprint) {
      // newEdges is a stage table read here — incrementParts' pair
      // generation/scoring frames stay untouched (lazy); only the linear
      // grouping reruns for member edges
      val (allMs, memberEdges, _) = incrementParts(baseMentions, deltaMs, cfg)
      val allScored = baseScoredEdges.unionByName(newEdges)
        .dropDuplicates("src", "dst")
      assemble(allMs.toDF(), allScored, memberEdges, cfg)
    }
    CacheTracker.drainUnpersist()
    out
  }

  /** Shared increment machinery: (old ∪ new mentions, fresh member
    * edges, new-involving scored edges) — all lazy except
    * supernodeCollapse's id-count. */
  private def incrementParts(baseMentions: DataFrame, deltaMs: DataFrame,
                             cfg: Config)
      : (Dataset[Mention], Option[DataFrame], DataFrame) = {
    val spark = deltaMs.sparkSession
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val allMs = CacheTracker.register(
      baseMentions.unionByName(deltaMs).as[Mention]
        .persist(StorageLevel.MEMORY_AND_DISK))
    val (scoringMs0, memberEdges) =
      if (cfg.supernode) supernodeCollapse(allMs, cfg) else (allMs, None)
    val scoringMs = CacheTracker.register(
      scoringMs0.persist(StorageLevel.MEMORY_AND_DISK))
    val keyed = CacheTracker.register(
      Blocking.withBlockKeys(scoringMs, cfg.lsh)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val newIds = deltaMs.select(col("mention_id").as("mid"))
    val activeKeys = keyed.join(newIds, Seq("mid"), "left_semi")
      .select("block_key").distinct()
    val keyedActive = keyed.join(activeKeys, Seq("block_key"), "left_semi")
    val pairs0 = CacheTracker.register(
      Blocking.candidatePairs(keyedActive, cfg.tau, cfg.blockMaxSize,
                              cfg.starThreshold, cfg.starK)
        .persist(StorageLevel.MEMORY_AND_DISK))
    // two hash semi-joins, not one OR-condition join (which would plan a
    // nested loop); the union double-counts new-new pairs → dedup
    val pairs = pairs0
      .join(newIds.withColumnRenamed("mid", "a_id"), Seq("a_id"), "left_semi")
      .unionByName(pairs0
        .join(newIds.withColumnRenamed("mid", "b_id"), Seq("b_id"), "left_semi"))
      .dropDuplicates("a_id", "b_id")
    val newEdges = Scoring.edges(Blocking.attachPayload(pairs, scoringMs), cfg.score)
    (allMs, memberEdges, newEdges)
  }

  /** Scored edge table of a from-scratch run over `ms` — the base-edge
    * bootstrap for [[runIncremental]] ([[runCheckpointed]]'s edges stage
    * persists exactly these rows with kind='scored'). */
  def scoredEdges(ms: Dataset[Mention], cfg: Config = Config()): DataFrame =
    CacheTracker.scoped {
      import org.apache.spark.storage.StorageLevel
      val msP = CacheTracker.register(ms.persist(StorageLevel.MEMORY_AND_DISK))
      val (scoringMs0, _) =
        if (cfg.supernode) supernodeCollapse(msP, cfg) else (msP, None)
      val scoringMs = CacheTracker.register(
        scoringMs0.persist(StorageLevel.MEMORY_AND_DISK))
      val keyed = Blocking.withBlockKeys(scoringMs, cfg.lsh)
      val pairIds = Blocking.candidatePairs(keyed, cfg.tau, cfg.blockMaxSize,
                                            cfg.starThreshold, cfg.starK)
      val out = Scoring.edges(Blocking.attachPayload(pairIds, scoringMs), cfg.score)
        .localCheckpoint(true)
      CacheTracker.drainUnpersist()
      out
    }

  /** Checkpointed variant: every stage lands in `$root/<stage>` with a
    * manifest; a rerun with the same fingerprint resumes instead of
    * recomputing (north_rule resumability). */
  def runCheckpointed(turns: Dataset[Turn],
                      dict: Map[String, DictEntry],
                      vecs: Map[String, Array[Float]],
                      root: String,
                      fingerprint: String,
                      cfg: Config = Config()): DataFrame = CacheTracker.scoped {
    val spark = turns.sparkSession
    val sc = spark.sparkContext
    val dictBc = sc.broadcast(dict)
    val vecsBc = sc.broadcast(vecs)
    val mentionsDf = TableIO.stage(spark, "mentions", s"$root/mentions", fingerprint) {
      allMentions(turns, dictBc, vecsBc, cfg).toDF()
    }
    checkpointedTail(spark, mentionsDf, root, fingerprint, cfg)
  }

  /** [[runCheckpointed]] for the DISTRIBUTED-dimension flagship: the
    * 100-TB configuration ([[runJoined]]) with every stage landing in a
    * resumable checkpoint table — a multi-day production run over a
    * beyond-broadcast dictionary must survive restarts too (north_rule
    * resumability). Stage tables and resume semantics are identical to
    * the broadcast variant; only the mention stage differs (joined
    * detect ∪ inherit + joined ED). */
  def runJoinedCheckpointed(turns: Dataset[Turn],
                            dictDf: Dataset[DictEntry],
                            vecDf: DataFrame,
                            root: String,
                            fingerprint: String,
                            cfg: Config = Config(),
                            expectedDictKeys: Long = 0L,
                            bloomFpp: Double = 0.01): DataFrame = CacheTracker.scoped {
    val spark = turns.sparkSession
    val mentionsDf = TableIO.stage(spark, "mentions", s"$root/mentions", fingerprint) {
      val ms0 =
        if (cfg.coref)
          Coref.detectAndInheritJoined(turns, dictDf, expectedDictKeys, bloomFpp)
        else
          MentionDetect.runJoined(turns, dictDf,
            spark.sparkContext.broadcast(Map.empty[String, Array[Float]]),
            expectedDictKeys, bloomFpp)
      MentionDetect.resolveJoined(ms0, vecDf).toDF()
    }
    checkpointedTail(spark, mentionsDf, root, fingerprint, cfg)
  }

  /** Shared block→score→cluster checkpoint chain over a (possibly
    * resumed) mentions stage table. */
  private def checkpointedTail(spark: SparkSession, mentionsDf: DataFrame,
                               root: String, fingerprint: String,
                               cfg: Config): DataFrame = {
    import spark.implicits._
    val ms = mentionsDf.as[Mention]
    // edges checkpoint keeps scored and member edges apart (kind column)
    // so the clusters stage can run CC on the small scored graph only.
    val edgesDf = TableIO.stage(spark, "edges", s"$root/edges", fingerprint) {
      val (scoringMs, memberEdges) =
        if (cfg.supernode) supernodeCollapse(ms, cfg) else (ms, None)
      val keyed = Blocking.withBlockKeys(scoringMs, cfg.lsh)
      val pairIds = Blocking.candidatePairs(keyed, cfg.tau, cfg.blockMaxSize,
                                            cfg.starThreshold, cfg.starK)
      val scored = Scoring.edges(Blocking.attachPayload(pairIds, scoringMs), cfg.score)
        .withColumn("kind", lit("scored"))
      memberEdges
        .map(me => scored.unionByName(me.withColumn("kind", lit("member"))))
        .getOrElse(scored)
    }
    // the edges stage table is on disk now — release blocking's caches
    CacheTracker.drainUnpersist()
    TableIO.stage(spark, "clusters", s"$root/clusters", fingerprint) {
      val scored = edgesDf.where(col("kind") === "scored").drop("kind")
      val member = edgesDf.where(col("kind") === "member").drop("kind")
      assemble(mentionsDf, scored,
               if (cfg.supernode) Some(member) else None, cfg)
    }
  }

  /** Pairwise P/R/F1 of a clustering vs gold entities, evaluated exactly on
    * the labeled pairs that share a blocking key (BASELINE.json metric).
    * Gold pairs and predicted pairs are both derived from the candidate
    * pair set, so the denominator matches the rule's definition. */
  case class PairF1(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
  }

  def pairwiseF1(clusters: DataFrame,
                 gold: Dataset[TranscriptGen.GoldMention],
                 dict: Map[String, DictEntry] = Map.empty,
                 cfg: Config = Config()): PairF1 = {
    // labeled pairs = candidate pairs (same blocking key) of gold mentions
    val goldWithId = gold.toDF()
      .withColumn("mention_id",
        concat(col("conv_id"), lit(":"), format_string("%06d", col("turn_idx")),
               lit(":"), format_string("%06d", col("begin"))))
    val pred = clusters.select(col("mention_id"), col("cluster_id"))
    val a = goldWithId.select(col("mention_id").as("a_id"), col("entity").as("a_e"))
    val b = goldWithId.select(col("mention_id").as("b_id"), col("entity").as("b_e"))
    val predA = pred.select(col("mention_id").as("a_id"), col("cluster_id").as("a_c"))
    val predB = pred.select(col("mention_id").as("b_id"), col("cluster_id").as("b_c"))
    val pairs = candidateGoldPairs(goldWithId, dict, cfg)
      .join(a, "a_id").join(b, "b_id")
      .join(predA, "a_id").join(predB, "b_id")
      .withColumn("is_match", col("a_e") === col("b_e"))
      .withColumn("same_cluster", col("a_c") === col("b_c"))
    val row = pairs.agg(
      sum(when(col("is_match") && col("same_cluster"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("is_match") && col("same_cluster"), 1L).otherwise(0L)).as("fp"),
      sum(when(col("is_match") && !col("same_cluster"), 1L).otherwise(0L)).as("fn"))
      .head()
    PairF1(row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** Gold-mention pairs sharing a blocking key — exact normalized-surface
    * key plus the MinHash-LSH band keys of the surface, i.e. the same key
    * families the pipeline blocks on (the labeled-pair universe of the
    * BASELINE.json metric). */
  private def candidateGoldPairs(goldWithId: DataFrame,
                                 dict: Map[String, DictEntry],
                                 cfg: Config): DataFrame = {
    val spark = goldWithId.sparkSession
    import spark.implicits._
    val lsh = cfg.lsh
    val dictBc = spark.sparkContext.broadcast(dict)
    val keyed = goldWithId.select(col("mention_id"), col("surface"))
      .as[(String, String)]
      .flatMap { case (id, surface) =>
        val sig = graft.functions.MinHash.signature(
          graft.functions.MinHash.charNgrams(surface, lsh.charNgram), lsh.k)
        val entKeys = dictBc.value.get(surface)
          .map(_.candidates.map(c => "ent:" + c.entity).toSeq).getOrElse(Nil)
        val keys = ("nm:" + surface) +:
          (graft.functions.MinHash.bandKeys(sig, lsh.bands, lsh.rows).toSeq ++ entKeys)
        keys.distinct.map(k => (k, id))
      }.toDF("block_key", "mention_id")
    val l = keyed.select(col("block_key"), col("mention_id").as("a_id"))
    val r = keyed.select(col("block_key"), col("mention_id").as("b_id"))
    l.join(r, Seq("block_key"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }
}
