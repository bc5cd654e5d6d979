package graft

import graft.model.{Mention, Turn}
import graft.sources.TranscriptGen
import org.apache.spark.sql.functions._

/** Incremental maintenance gate: appending new conversations via
  * Pipeline.runIncremental must reproduce the from-scratch clustering on
  * the F1 fixtures (clean-scorer corpora), with pair work delta-bound. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  val cfg = TranscriptGen.GenConfig(nEntities = 150, nConvs = 300)
  lazy val turns = TranscriptGen.transcripts(spark, cfg).cache()
  lazy val gold = TranscriptGen.goldMentions(spark, cfg).cache()
  lazy val dict = TranscriptGen.dict(cfg)
  lazy val vecs = TranscriptGen.entityVectors(cfg, graft.operators.MentionDetect.CtxDim)
  lazy val dictBc = spark.sparkContext.broadcast(dict)
  lazy val vecsBc = spark.sparkContext.broadcast(vecs)
  lazy val full = Pipeline.run(turns, dict, vecs).cache()

  private def assign(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("mention_id", "cluster_id").as[(String, String)].collect().toMap

  private def convSlice(convs: Seq[String]) =
    turns.where(col("conv_id").isInCollection(convs)).as[Turn]

  private lazy val convs: Seq[String] =
    turns.select("conv_id").distinct().as[String].collect().sorted.toSeq

  test("one increment reproduces the from-scratch clustering; pair work is delta-bound") {
    val (oldConvs, newConvs) = convs.splitAt((convs.length * 0.6).toInt)
    val baseMs = Pipeline.allMentions(convSlice(oldConvs), dictBc, vecsBc).toDF().cache()
    val baseEdges = Pipeline.scoredEdges(baseMs.as[Mention]).cache()

    val inc = Pipeline.runIncremental(convSlice(newConvs), dict, vecs, baseMs, baseEdges)
    assert(assign(inc.clusters) == assign(full))

    // delta-bound: every newly scored edge touches a delta mention
    val deltaIds = inc.deltaMentions.select("mention_id").as[String].collect().toSet
    assert(deltaIds.nonEmpty)
    val newEdges = inc.newEdges.select("src", "dst").as[(String, String)].collect()
    assert(newEdges.nonEmpty)
    assert(newEdges.forall { case (s, d) => deltaIds.contains(s) || deltaIds.contains(d) },
      "an incremental edge re-scored a historical pair")
  }

  test("chained increments equal from-scratch and pass the F1 gate") {
    val third = convs.length / 3
    val (a, rest) = convs.splitAt(third)
    val (b, c) = rest.splitAt(third)

    val baseMs = Pipeline.allMentions(convSlice(a), dictBc, vecsBc).toDF().cache()
    val baseEdges = Pipeline.scoredEdges(baseMs.as[Mention]).cache()

    val inc1 = Pipeline.runIncremental(convSlice(b), dict, vecs, baseMs, baseEdges)
    // chain: append the delta tables (what production appends to Iceberg)
    val ms2 = baseMs.unionByName(inc1.deltaMentions).cache()
    val edges2 = baseEdges.unionByName(inc1.newEdges).cache()
    val inc2 = Pipeline.runIncremental(convSlice(c), dict, vecs, ms2, edges2)

    assert(assign(inc2.clusters) == assign(full))
    val f1 = Pipeline.pairwiseF1(inc2.clusters, gold, dict)
    info(f"chained-increment F1=${f1.f1}%.4f (tp=${f1.tp} fp=${f1.fp} fn=${f1.fn})")
    assert(f1.f1 >= 0.99)
  }

  test("checkpointed increment == from-scratch; same-fingerprint rerun resumes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val (oldConvs, newConvs) = convs.splitAt((convs.length * 0.6).toInt)
    val baseMs = Pipeline.allMentions(convSlice(oldConvs), dictBc, vecsBc).toDF().cache()
    val baseEdges = Pipeline.scoredEdges(baseMs.as[Mention]).cache()

    val out1 = Pipeline.runIncrementalCheckpointed(
      convSlice(newConvs), dict, vecs, baseMs, baseEdges, dir, "fp1")
    assert(assign(out1) == assign(full))

    // resume proof: EMPTY new turns but the same fingerprint — the full
    // clustering must come back from the stage tables alone
    val out2 = Pipeline.runIncrementalCheckpointed(
      spark.emptyDataset[Turn], dict, vecs, baseMs, baseEdges, dir, "fp1")
    assert(assign(out2) == assign(full))
  }
}
