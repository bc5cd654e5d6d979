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
      tau: Int = 2000,
      blockMaxSize: Int = 200000,
      ccMaxIter: Int = 50)

  def mentions(turns: Dataset[Turn],
               dictBc: Broadcast[Map[String, DictEntry]],
               vecsBc: Broadcast[Map[String, Array[Float]]]): Dataset[Mention] =
    MentionDetect.run(turns, dictBc, vecsBc)

  /** mentions → (mention_id, conv_id, turn_idx, begin, end, surface, norm,
    * resolved, cluster_id). Singleton mentions keep their own id. */
  def cluster(ms: Dataset[Mention], cfg: Config = Config()): DataFrame = {
    val keyed = Blocking.withBlockKeys(ms, cfg.lsh)
    val pairs = Blocking.candidatePairs(keyed, cfg.tau, cfg.blockMaxSize)
    val es = Scoring.edges(pairs, cfg.score)
    val assign = Clustering.connectedComponents(es, cfg.ccMaxIter)
    ms.toDF()
      .join(assign, ms("mention_id") === assign("node"), "left")
      .select(col("mention_id"), col("conv_id"), col("turn_idx"), col("begin"),
              col("end"), col("surface"), col("norm"), col("resolved"),
              coalesce(col("cluster_id"), col("mention_id")).as("cluster_id"))
  }

  /** Full run from raw turns. */
  def run(turns: Dataset[Turn],
          dict: Map[String, DictEntry],
          vecs: Map[String, Array[Float]],
          cfg: Config = Config()): DataFrame = {
    val sc = turns.sparkSession.sparkContext
    cluster(mentions(turns, sc.broadcast(dict), sc.broadcast(vecs)), cfg)
  }

  /** Checkpointed variant: every stage lands in `$root/<stage>` with a
    * manifest; a rerun with the same fingerprint resumes instead of
    * recomputing (north_rule resumability). */
  def runCheckpointed(turns: Dataset[Turn],
                      dict: Map[String, DictEntry],
                      vecs: Map[String, Array[Float]],
                      root: String,
                      fingerprint: String,
                      cfg: Config = Config()): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val dictBc = sc.broadcast(dict)
    val vecsBc = sc.broadcast(vecs)

    val mentionsDf = TableIO.stage(spark, "mentions", s"$root/mentions", fingerprint) {
      mentions(turns, dictBc, vecsBc).toDF()
    }
    val ms = mentionsDf.as[Mention]
    val edgesDf = TableIO.stage(spark, "edges", s"$root/edges", fingerprint) {
      val keyed = Blocking.withBlockKeys(ms, cfg.lsh)
      Scoring.edges(Blocking.candidatePairs(keyed, cfg.tau, cfg.blockMaxSize), cfg.score)
    }
    TableIO.stage(spark, "clusters", s"$root/clusters", fingerprint) {
      val assign = Clustering.connectedComponents(edgesDf, cfg.ccMaxIter)
      mentionsDf
        .join(assign, mentionsDf("mention_id") === assign("node"), "left")
        .select(col("mention_id"), col("conv_id"), col("turn_idx"), col("begin"),
                col("end"), col("surface"), col("norm"), col("resolved"),
                coalesce(col("cluster_id"), col("mention_id")).as("cluster_id"))
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
