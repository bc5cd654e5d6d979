package graft

import graft.model._
import org.apache.spark.sql.functions._

/** Dev decomposition profile for the heavy flagship-family queries:
  * times each stage of the q36 joined flagship (and q13's cluster tail)
  * in isolation so optimization effort lands where the seconds are.
  * `sbt "runMain graft.OpProfile [q36|q13]"`; reads
  * SPARK_GRAFT_SF_DIR / _CPUS like Bench. Not part of any contract. */
object OpProfile {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q36")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = Bench.benchSession(cpus)
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()
    QueryLib.docs(spark, sfDir).count()

    Pipeline.PhaseTimer.sink = Some((n, s) =>
      println(f"[opprofile]   phase:$n%-24s $s%8.2f s"))

    def timed[A](name: String)(body: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val a = body
      println(f"[opprofile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    which match {
      case "q36" =>
        val dictPath = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_opp_dict_${spark.sparkContext.applicationId}").getAbsolutePath
        QueryLib.bigramDict.values.toSeq.sortBy(_.mention).toDS()
          .coalesce(1).write.mode("overwrite").parquet(dictPath)
        val dictDf = spark.read.parquet(dictPath).as[DictEntry]
        val vecDf = Seq.empty[(String, Array[Float])].toDF("entity", "vec")
        val turns = QueryLib.turnsDs(spark, sfDir)
        val turnsCk = timed("turns materialize") {
          turns.toDF().localCheckpoint(true)
        }.as[Turn]
        val ms0 = timed("detectAndInheritJoined") {
          operators.Coref.detectAndInheritJoined(turnsCk, dictDf,
            expectedDictKeys = QueryLib.bigramDict.size.toLong)
            .toDF().localCheckpoint(true)
        }
        println(s"[opprofile] mentions rows = ${ms0.count()}")
        val resolved = timed("resolveJoined") {
          operators.MentionDetect.resolveJoined(ms0.as[Mention], vecDf)
            .toDF().localCheckpoint(true)
        }
        timed("cluster tail") {
          Pipeline.cluster(resolved.as[Mention]).count()
        }
      case "q13" =>
        val turns = QueryLib.turnsDs(spark, sfDir)
        val turnsCk = timed("turns materialize") {
          turns.toDF().localCheckpoint(true)
        }.as[Turn]
        val dictBc = spark.sparkContext.broadcast(QueryLib.bigramDict)
        val vecsBc = spark.sparkContext.broadcast(Map.empty[String, Array[Float]])
        val ms = timed("detectAndInherit (bcast)") {
          operators.Coref.detectAndInherit(turnsCk, dictBc, vecsBc)
            .toDF().localCheckpoint(true)
        }
        println(s"[opprofile] mentions rows = ${ms.count()}")
        timed("cluster tail") {
          Pipeline.cluster(ms.as[Mention]).count()
        }
      case other => sys.error(s"unknown profile: $other")
    }
    spark.stop()
  }
}
