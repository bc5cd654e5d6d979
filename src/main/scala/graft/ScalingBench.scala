package graft

import graft.sources.TranscriptGen
import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.md protocol): the identical
  * end-to-end pipeline on identical on-disk input at local[N] and
  * local[4N], one discarded warm-up per level, efficiency =
  * (thr_4N/thr_N)/4.
  *
  * One LEVEL per JVM: `sbt "runMain graft.ScalingBench 8"` then
  * `sbt "runMain graft.ScalingBench 32"`. A shared JVM leaks heap/GC
  * state across levels (measured: the same run is 2× slower after another
  * level ran first), and separate JVMs are also what real N- and
  * 4N-executor clusters are. Combine the two JSON lines with
  * tools/scaling_report.py.
  *
  * This is the sandbox stand-in for the north rule's "N and 4N executors"
  * criterion (no real cluster exists here — see BASELINE.md §scaling). */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val cfg = TranscriptGen.GenConfig(
      nEntities = 2000,
      nConvs = sys.env.getOrElse("GRAFT_SCALE_CONVS", "2000000").toInt)

    // generate once (untimed); reused across invocations via the path
    val gen = Bench.benchSession("32")
    val path = Bench.ensureCorpus(gen, cfg)
    gen.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    def oneRun(): (Double, Long) = {
      val spark = Bench.benchSession(cpus.toString)
      val (secs, turns, _) = Bench.runPipeline(spark, path, cfg)
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (secs, turns)
    }
    val (warm, _) = oneRun() // discarded warm-up
    val (secs, turns) = oneRun()
    val thr = turns / secs
    println(f"""{"metric":"scaling_level","cpus":$cpus,"secs":$secs%.2f,""" +
            f""""turns":$turns,"turns_per_sec":$thr%.1f,"warmup_secs":$warm%.2f,""" +
            s""""n_convs":${cfg.nConvs}}""")
  }
}
