package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets

/** Stage checkpoint I/O with per-partition lineage + idempotent resume
  * (north_rule: "checkpoints each stage ... with per-partition lineage and
  * counters so any stage resumes idempotently").
  *
  * Format is pluggable behind this object: the sandbox has no Iceberg
  * runtime jar (SURVEY.md §0), so `format = "parquet"`; in production the
  * same call sites write `format("iceberg")` with overwrite-by-stage-run
  * semantics. Resume contract: a stage directory with a manifest whose
  * input fingerprint matches is read back instead of recomputed, so a
  * killed-and-restarted job redoes only unfinished stages; a re-run of a
  * finished stage produces byte-identical tables (BASELINE.md
  * "Resumability").
  */
object TableIO {

  val format: String = sys.env.getOrElse("GRAFT_TABLE_FORMAT", "parquet")

  case class Manifest(stage: String, fingerprint: String, rows: Long,
                      partitions: Seq[(Int, Long)])

  private def manifestPath(dir: String): Path = Paths.get(dir, "_graft_manifest.json")

  def writeManifest(dir: String, m: Manifest): Unit = {
    val parts = m.partitions
      .map { case (p, n) => s"""{"pid":$p,"rows":$n}""" }.mkString("[", ",", "]")
    val json =
      s"""{"stage":"${m.stage}","fingerprint":"${m.fingerprint}","rows":${m.rows},"partitions":$parts}"""
    Files.createDirectories(Paths.get(dir))
    Files.write(manifestPath(dir), json.getBytes(StandardCharsets.UTF_8))
  }

  def readFingerprint(dir: String): Option[String] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      """"fingerprint":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
    }
  }

  /** Compute-or-resume a stage. `fingerprint` must capture everything the
    * stage output depends on (input fingerprints + config). */
  def stage(spark: SparkSession, name: String, dir: String, fingerprint: String)
           (compute: => DataFrame): DataFrame = {
    if (readFingerprint(dir).contains(fingerprint)) {
      spark.read.format(format).load(s"$dir/data")
    } else {
      compute.write.format(format).mode("overwrite").save(s"$dir/data")
      val df = spark.read.format(format).load(s"$dir/data")
      // per-partition lineage counters (cheap second pass over the
      // checkpoint, columnar count-only scan)
      val parts = df.groupBy(spark_partition_id().as("pid"))
        .count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
      writeManifest(dir, Manifest(name, fingerprint, parts.map(_._2).sum, parts))
      df
    }
  }
}
