package graft

import graft.model.Turn
import graft.operators._
import graft.sources.TranscriptGen
import org.apache.spark.sql.functions._

/** Dev profiling main: per-stage wall times of the ER pipeline.
  * `sbt "runMain graft.StageProfile [nConvs] [cpus]"` */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(5000)
    val cpus = args.lift(1).getOrElse("32")
    val spark = Bench.benchSession(cpus)
    import spark.implicits._
    val cfg = TranscriptGen.GenConfig(nEntities = 2000, nConvs = nConvs)
    val path = Bench.ensureCorpus(spark, cfg)
    val dict = TranscriptGen.dict(cfg)
    val vecs = TranscriptGen.entityVectors(cfg, MentionDetect.CtxDim)
    val turns = spark.read.parquet(path).as[Turn]

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val nTurns = time("read")(turns.count())
    println(s"turns=$nTurns")
    val dictBc = spark.sparkContext.broadcast(dict)
    val vecsBc = spark.sparkContext.broadcast(vecs)
    val ms = Pipeline.mentions(turns, dictBc, vecsBc).cache()
    println(s"mentions=${time("mentions")(ms.count())}")
    val pcfg = Pipeline.Config()
    // supernode internals, timed stage by stage
    val msDf = ms.toDF()
    val eligible = msDf.where(col("resolved") =!= "" &&
      col("resolvedScore") >= pcfg.score.minMargin)
    val reps = eligible.groupBy("norm", "resolved").agg(min("mention_id").as("rep_id"))
    val withRep = eligible.join(reps, Seq("norm", "resolved"))
    val memberEdges = withRep.where(col("mention_id") =!= col("rep_id"))
      .select(col("rep_id").as("src"), col("mention_id").as("dst")).cache()
    println(s"memberEdges=${time("supernode")(memberEdges.count())}")
    val scoringMs = msDf
      .join(withRep.select(col("mention_id"), col("rep_id")), Seq("mention_id"), "left")
      .where(col("rep_id").isNull || col("rep_id") === col("mention_id"))
      .drop("rep_id").as[graft.model.Mention].cache()
    println(s"scoringMs=${time("scoring_set")(scoringMs.count())}")
    val keyed = Blocking.withBlockKeys(scoringMs, pcfg.lsh).cache()
    println(s"keyed=${time("blockkeys")(keyed.count())}")
    val pairIds = Blocking.candidatePairs(keyed, pcfg.tau, pcfg.blockMaxSize,
                                          pcfg.starThreshold, pcfg.starK).cache()
    println(s"pairs=${time("pairs")(pairIds.count())}")
    val es = Scoring.edges(Blocking.attachPayload(pairIds, scoringMs), pcfg.score).cache()
    println(s"edges=${time("score")(es.count())}")
    val assign = time("cc")(Clustering.connectedComponents(es, pcfg.ccMaxIter).cache())
    println(s"assign=${time("cc_cnt")(assign.count())}")
    // end-to-end single shot (what Bench times)
    val (secs, nT, n) = Bench.runPipeline(spark, path, cfg)
    println(f"[stage] end2end      $secs%8.2f s  ($nT turns, $n mentions, ${nT / secs}%.0f turns/s)")
    spark.stop()
  }
}
