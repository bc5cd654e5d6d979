package graft

import graft.model.Turn
import graft.sources.TranscriptGen
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, plus the end-to-end ER pipeline over a deterministic
  * synthetic transcript corpus (generated once, cached as parquet,
  * generation excluded from timing). Prints ONE JSON line. */
object Bench {

  def benchSession(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // smaller input splits: the detection stage is the big map pass and
      // 128 MB splits gave only ~2.3 task waves at 28 cores (straggler
      // tail, util 0.75 measured); 32 MB packs 4x more tasks
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Materialize the bench transcript corpus (idempotent). Returns path. */
  def ensureCorpus(spark: SparkSession, cfg: TranscriptGen.GenConfig): String = {
    // v3: corpus content changed (dict-absent abbreviated coref
    // follow-ups) — the version tag keeps stale round-2 caches out
    val path = s"target/bench/transcripts_v3_${cfg.nConvs}_${cfg.nEntities}"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      TranscriptGen.transcripts(spark, cfg)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** One timed end-to-end pipeline run; returns (seconds, turns, clusters). */
  def runPipeline(spark: SparkSession, path: String,
                  cfg: TranscriptGen.GenConfig,
                  pcfg: Pipeline.Config = Pipeline.Config()): (Double, Long, Long) = {
    import spark.implicits._
    val dict = TranscriptGen.dict(cfg)
    val vecs = TranscriptGen.entityVectors(cfg, operators.MentionDetect.CtxDim)
    val turns = spark.read.parquet(path).as[Turn]
    val nTurns = turns.count()
    val t0 = System.nanoTime()
    val clusters = Pipeline.run(turns, dict, vecs, pcfg)
    val n = clusters.count()
    ((System.nanoTime() - t0) / 1e9, nTurns, n)
  }

  // ---- contention telemetry (round-2 verdict "What's wrong" #6): the
  // driver's BENCH_r02 was captured in a contended window and read as a
  // fake 1.75x regression that cost a full adjudication. Every timed
  // query now records its GC time and the host load average, and the
  // slowest query is re-run once — a contended artifact is identifiable
  // from the JSON alone (high load / rerun much faster than first run).

  private def gcMs(): Long = {
    val it = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.iterator()
    var s = 0L
    while (it.hasNext) s += math.max(0L, it.next().getCollectionTime)
    s
  }
  private def loadAvg(): Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  case class QueryTelemetry(secs: Double, gcMs: Long, load: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: headline queries run at local[32] (capped at the box size)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = benchSession(cpus)

    // Untimed warm-up: JIT the scheduler/codegen/parquet paths so the
    // first measured query isn't charged the session's one-time costs
    // (measured 6-8 s on q01 otherwise — pure JVM warm-up, not plan cost).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    QueryLib.docs(spark, sfDir).count()

    val results = scala.collection.mutable.LinkedHashMap[String, QueryTelemetry]()
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    def timed(name: String)(body: => Unit): QueryTelemetry = {
      val gc0 = gcMs()
      val t0 = System.nanoTime()
      try body catch {
        case e: Throwable =>
          // a crashed query must not be recorded as a fast success
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
      QueryTelemetry((System.nanoTime() - t0) / 1e9, gcMs() - gc0, loadAvg())
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = timed(name) { fn(spark, sfDir).count(): Unit }
    }

    // re-run the slowest successful query once: in a quiet window the two
    // times agree; under contention the rerun is typically much faster,
    // flagging the whole artifact as environmental. The session memo of
    // the clustered frame is evicted first — without that, the rerun of
    // q13/q14 is a memo hit (round-3: 9.46 s → 0.096 s even when quiet)
    // and the probe always "detects" contention. Rerun failures are
    // reported in the rerun object itself, never appended to `failed`
    // (a first-run success must not be retro-flagged by its probe).
    val rerun = results.filterNot { case (k, _) => failed.contains(k) }
      .maxByOption(_._2.secs).map { case (worst, first) =>
        QueryLib.evictClusterMemo(spark, sfDir)
        val t0 = System.nanoTime()
        val second =
          try { SparkEntry.queries(worst)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] rerun of $worst FAILED: ${e.getMessage}"); -1.0 }
        (worst, first.secs, second)
      }

    // end-to-end ER pipeline over synthetic transcripts (~6.5 turns/conv)
    val cfg = TranscriptGen.GenConfig(
      nEntities = 2000,
      nConvs = sys.env.getOrElse("GRAFT_BENCH_CONVS", "20000").toInt)
    val path = ensureCorpus(spark, cfg)
    var nTurns = 0L
    results("er_pipeline") = {
      val gc0 = gcMs(); val t0 = System.nanoTime()
      val (secs, n, _) = runPipeline(spark, path, cfg)
      nTurns = n
      QueryTelemetry(secs, gcMs() - gc0, loadAvg())
    }
    val throughput = nTurns / results("er_pipeline").secs

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.secs }.mkString("{", ",", "}")
    val tele = results.map { case (k, v) =>
      s""""$k":{"gc_ms":${v.gcMs},"load":${v.load}}"""
    }.mkString("{", ",", "}")
    val fq = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rr = rerun.map { case (n, a, b) =>
      s""","rerun_worst":{"name":"$n","first_sec":$a,"second_sec":$b}"""
    }.getOrElse("")
    val total = results.values.map(_.secs).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
               s""""failed":$fq,"er_turns_per_sec":$throughput,"er_turns":$nTurns,""" +
               s""""telemetry":$tele,"ncpu":${Runtime.getRuntime.availableProcessors()}$rr,"sf":"$sfDir"}"""
    println(json)
    // also land the line in a file: the round-1 driver failed to parse it
    // out of interleaved sbt/log4j noise on stdout
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
