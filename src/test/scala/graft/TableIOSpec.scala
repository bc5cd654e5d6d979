package graft

import graft.sources.TableIO
import java.nio.file.Files

class TableIOSpec extends SparkSpec {
  import spark.implicits._

  test("stage computes once, resumes from checkpoint, recomputes on new fingerprint") {
    val dir = Files.createTempDirectory("graft-stage").toString
    var computes = 0
    def run(fp: String) = TableIO.stage(spark, "s1", dir, fp) {
      computes += 1
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    val first = run("fp1").collect().toSet
    assert(computes == 1)
    val second = run("fp1").collect().toSet // resume, no recompute
    assert(computes == 1)
    assert(first == second)
    run("fp2") // input changed → recompute
    assert(computes == 2)
  }

  test("manifest carries per-partition lineage counters") {
    val dir = Files.createTempDirectory("graft-stage2").toString
    TableIO.stage(spark, "s2", dir, "fp") {
      spark.range(100).repartition(4).toDF()
    }
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_graft_manifest.json")))
    assert(manifest.contains(""""stage":"s2""""))
    assert(manifest.contains(""""rows":100"""))
    assert(manifest.contains(""""pid""""))
  }

  test("re-running a finished stage is idempotent (identical table)") {
    val dir = Files.createTempDirectory("graft-stage3").toString
    def df = spark.range(50).selectExpr("id", "id * 2 as v")
    val a = TableIO.stage(spark, "s3", dir, "fp")(df).collect().toSet
    val b = TableIO.stage(spark, "s3", dir, "fp")(df).collect().toSet
    assert(a == b)
  }
}
