package graft

import graft.model.Turn
import graft.sources.TranscriptGen
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiling main: per-Spark-job wall times + task-time totals for one
  * end-to-end pipeline run, plus the inter-job driver gaps — the direct
  * decomposition of the serial fraction that caps N→4N scaling
  * efficiency. `sbt "runMain graft.JobProfile [nConvs] [cpus]"` */
object JobProfile {

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(4000000)
    val cpus = args.lift(1).getOrElse("28")
    val spark = Bench.benchSession(cpus)
    import spark.implicits._
    val cfg = TranscriptGen.GenConfig(nEntities = 2000, nConvs = nConvs)
    val path = Bench.ensureCorpus(spark, cfg)

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   var taskTimeMs: Long = 0L, var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = Job(e.jobId, e.time) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          // attribute to the newest unfinished job (local mode: 1 at a time)
          jobs.values.toSeq.reverse.find(_.end == 0L).foreach { j =>
            j.taskTimeMs += e.taskInfo.duration; j.nTasks += 1
          }
        }
    })

    val dict = TranscriptGen.dict(cfg)
    val vecs = TranscriptGen.entityVectors(cfg, operators.MentionDetect.CtxDim)
    val turns = spark.read.parquet(path).as[Turn]
    turns.count() // warm read path, untimed
    args.lift(2) match {
      case Some("warm") =>
        // full warm-up pass in the same JVM (NOTE: leaves the previous
        // run's checkpoint blocks around — matches a dirty long-lived JVM)
        Pipeline.run(turns, dict, vecs).count()
      case Some("warmsmall") =>
        // ScalingBench protocol: JIT warm-up on a 1/8-size corpus
        val wCfg = cfg.copy(nConvs = cfg.nConvs / 8)
        val wPath = Bench.ensureCorpus(spark, wCfg)
        Bench.runPipeline(spark, wPath, wCfg)
      case _ =>
    }
    jobs.synchronized(jobs.clear())

    val t0 = System.currentTimeMillis()
    val clusters = Pipeline.run(turns, dict, vecs)
    val n = clusters.count()
    val t1 = System.currentTimeMillis()

    Thread.sleep(500) // let listener events drain
    val snap = jobs.synchronized(jobs.values.toSeq.sortBy(_.start))
    var prevEnd = t0
    var gapTotal = 0L
    println(f"[jobprof] total ${(t1 - t0) / 1e3}%8.2f s, clusters=$n, cpus=$cpus")
    snap.foreach { j =>
      val gap = j.start - prevEnd
      gapTotal += math.max(0L, gap)
      val wall = (j.end - j.start) / 1e3
      val util = if (j.end > j.start) j.taskTimeMs / 1e3 / (wall * cpus.toInt) else 0.0
      println(f"[jobprof] job ${j.id}%3d gap=${gap / 1e3}%6.2f s wall=$wall%7.2f s " +
              f"tasks=${j.nTasks}%4d taskTime=${j.taskTimeMs / 1e3}%8.1f s util=$util%5.2f")
      prevEnd = math.max(prevEnd, j.end)
    }
    println(f"[jobprof] driver gaps total ${gapTotal / 1e3}%.2f s of ${(t1 - t0) / 1e3}%.2f s")
    spark.stop()
  }
}
