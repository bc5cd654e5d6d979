package graft

import graft.model._
import graft.operators.MentionDetect
import graft.sources.TranscriptGen

/** Join-based (dimension-table) detection ≡ broadcast-Map detection — the
  * SURVEY D3 degrade-path property (round-2 verdict's top task). The
  * fixture corpus exercises cased, ALL-CAPS, typo'd, abbreviated and
  * ambiguous (multi-candidate) surfaces, so the equivalence covers the
  * whole preprocess_mention cascade and the ED resolution, not just exact
  * lowercase hits. */
class JoinedDetectSpec extends SparkSpec {
  import spark.implicits._

  val cfg = TranscriptGen.GenConfig(nEntities = 120, nConvs = 150)
  lazy val turns = TranscriptGen.transcripts(spark, cfg).cache()
  lazy val dict = TranscriptGen.dict(cfg)
  lazy val vecs = TranscriptGen.entityVectors(cfg, MentionDetect.CtxDim)

  private def mentionKeys(ds: org.apache.spark.sql.Dataset[Mention]) =
    ds.map(m => (m.mention_id, m.begin, m.end, m.surface, m.norm,
                 m.resolved, math.round(m.resolvedScore * 1e9), m.ctx.toSeq))
      .collect().toSet

  test("join path emits exactly the broadcast path's mentions (full payload)") {
    val vecsBc = spark.sparkContext.broadcast(vecs)
    val viaBroadcast = mentionKeys(
      MentionDetect.run(turns, spark.sparkContext.broadcast(dict), vecsBc))
    val dictDf = dict.values.toSeq.toDS().repartition(4)
    val viaJoin = mentionKeys(MentionDetect.runJoined(turns, dictDf, vecsBc))
    assert(viaBroadcast.nonEmpty)
    val onlyB = viaBroadcast -- viaJoin
    val onlyJ = viaJoin -- viaBroadcast
    assert(onlyB.isEmpty, s"broadcast-only mentions: ${onlyB.take(3)}")
    assert(onlyJ.isEmpty, s"join-only mentions: ${onlyJ.take(3)}")
  }

  test("fully-joined path (dict AND entity vectors as dimension tables) ≡ broadcast") {
    // the embedding-side twin of the dictionary property: REL-scale
    // entity vectors can't broadcast either. The fixture's ambiguous
    // surfaces make ED depend on the context-vector cosine, so this
    // would fail if the gathered vectors differed at all.
    val vecsBc = spark.sparkContext.broadcast(vecs)
    val viaBroadcast = mentionKeys(
      MentionDetect.run(turns, spark.sparkContext.broadcast(dict), vecsBc))
    val dictDf = dict.values.toSeq.toDS().repartition(4)
    val vecDf = vecs.toSeq.toDF("entity", "vec").repartition(3)
    val viaJoin = mentionKeys(MentionDetect.runJoinedFull(turns, dictDf, vecDf))
    assert(viaJoin == viaBroadcast)
    // resolution really used the vectors: ambiguous golds resolve with
    // sub-1.0 margins, which only happens when cosines were computed
    assert(viaJoin.exists(m => m._7 != 1000000000L && m._6.nonEmpty))
  }

  test("equivalence survives a parquet round-trip and an aggressive bloom fpp") {
    // fpp = 0.5 floods the join with bloom false positives — they must all
    // die in the dictionary join, leaving the mention set unchanged; the
    // parquet round-trip pins the dimension-table storage contract
    val dir = java.nio.file.Files.createTempDirectory("graft-dictdim").toString
    dict.values.toSeq.sortBy(_.mention).toDS()
      .write.mode("overwrite").parquet(dir)
    val dictDf = spark.read.parquet(dir).as[DictEntry]
    val vecsBc = spark.sparkContext.broadcast(vecs)
    val viaJoin = mentionKeys(
      MentionDetect.runJoined(turns, dictDf, vecsBc, bloomFpp = 0.5))
    val viaBroadcast = mentionKeys(
      MentionDetect.run(turns, spark.sparkContext.broadcast(dict), vecsBc))
    assert(viaJoin == viaBroadcast)
  }
}
