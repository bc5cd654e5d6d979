package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` of declared queries to files —
  * the plan evidence for the optimization-round ledger
  * (`plans/r06/<query>_<tag>.txt`). Building a query's DataFrame executes
  * any eager stages it contains (localCheckpoints, staged writes), so the
  * dumped plan is the final consumed frame's plan — exactly what the
  * bench's `.count()` pays for.
  *
  * `sbt "runMain graft.PlanDump <outDir> <tag> [q13_er_clusters,...]"`
  * (no query list = all queries). Reads SPARK_GRAFT_SF_DIR / _CPUS like
  * Bench. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val tag = args.lift(1).getOrElse("before")
    val names = args.lift(2) match {
      case Some(csv) => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = Bench.benchSession(cpus)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"plandump: $name")
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val secs = (System.nanoTime() - t0) / 1e9
          Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
            (s"-- $name ($tag), build+explain ${f"$secs%.2f"}s, sf=$sfDir\n" + plan)
              .getBytes(StandardCharsets.UTF_8))
          println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
        case None => System.err.println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
  }
}
