package graft

/** Extra benchmark main (guide §1.4): times selected queries with the
  * NOOP sink — `df.write.format("noop")` computes every column of every
  * row and discards it — isolating the computation from both the count's
  * column pruning and any output sink. Never replaces Bench (the frozen
  * driver contract); numbers are cited in OPTIMIZATION_r06.md.
  *
  * `sbt "runMain graft.BenchExtra [q13_er_clusters,...] [reps]"`
  * (no list = all queries, reps default 1). Reads SPARK_GRAFT_SF_DIR /
  * _CPUS like Bench; prints one JSON line. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.filter(_.nonEmpty) match {
      case Some(csv) => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = Bench.benchSession(cpus)
    // same warm-up as Bench so the first query isn't charged JIT cost
    spark.range(1000000L).selectExpr("sum(id)").collect()
    QueryLib.docs(spark, sfDir).count()
    val out = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    names.foreach { name =>
      if (!SparkEntry.queries.contains(name))
        System.err.println(s"[benchextra] unknown query: $name (skipped)")
      SparkEntry.queries.get(name).foreach { fn =>
        val times = (1 to reps).map { rep =>
          // each rep recomputes from parquet (memoized stages evicted)
          QueryLib.evictClusterMemo(spark, sfDir)
          spark.sparkContext.setJobDescription(s"noop: $name rep$rep")
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        out(name) = times
      }
    }
    val fields = out.map { case (k, v) =>
      s""""$k":[${v.map(t => f"$t%.3f").mkString(",")}]"""
    }.mkString(",")
    println(s"""{"bench":"noop","sf":"$sfDir","cpus":$cpus,$fields}""")
    spark.stop()
  }
}
