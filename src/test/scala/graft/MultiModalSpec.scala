package graft

import graft.operators.MultiModal
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "hello world", "srcA"),
    (2L, "hello world", "srcB"),   // payload duplicate of 1
    (3L, "different text", "srcA"),
    (4L, "hello world", "srcA"))   // payload duplicate of 1
    .toDF("doc_id", "text", "source")

  test("payload + meta: bytes, sha, and dims are deterministic column math") {
    val m = MultiModal.withMeta(MultiModal.withPayload(docs))
      .select(col("doc_id"), col("modality"), col("meta.n_bytes"),
              col("meta.sha"), col("meta.width"), col("meta.height"))
      .as[(Long, String, Long, String, Int, Int)].collect().sortBy(_._1)
    assert(m.length == 4)
    val r1 = m(0)
    assert(r1._3 == "hello world".getBytes("UTF-8").length)
    assert(r1._4 == java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(r1._5 >= 0 && r1._5 < 640 && r1._6 >= 0 && r1._6 < 480)
    assert(MultiModal.Modalities.contains(r1._2))
    // identical payloads → identical meta regardless of doc/source
    assert(m(0)._4 == m(1)._4 && m(0)._4 == m(3)._4 && m(0)._4 != m(2)._4)
  }

  test("dedupByPayload keeps the min-id representative per content sha") {
    val m = MultiModal.withMeta(MultiModal.withPayload(docs))
    val reps = MultiModal.dedupByPayload(m)
      .select(col("doc_id"), col("group_size")).as[(Long, Long)]
      .collect().toSet
    assert(reps == Set((1L, 3L), (3L, 1L)))
  }

  test("decodeFeatures: batch shape, fixed dim, content-deterministic") {
    val m = MultiModal.withPayload(docs)
    val f = MultiModal.decodeFeatures(m, 16)
      .select(col("doc_id"), col("features")).as[(Long, Array[Float])]
      .collect().toMap
    assert(f.size == 4)
    assert(f.values.forall(_.length == 16))
    // same payload → same features; decode is a pure function of bytes
    assert(f(1L).toSeq == f(2L).toSeq && f(1L).toSeq == f(4L).toSeq)
    assert(f(1L).toSeq != f(3L).toSeq)
    // repeated run identical (no per-partition RNG state)
    val g = MultiModal.decodeFeatures(m, 16)
      .select(col("doc_id"), col("features")).as[(Long, Array[Float])]
      .collect().toMap
    assert(g.view.mapValues(_.toSeq).toMap == f.view.mapValues(_.toSeq).toMap)
  }

  test("payloads ride through exact dedup untouched (binary column safety)") {
    val m = MultiModal.withPayload(docs)
    val out = graft.operators.Dedup.exact(
      m.select(col("doc_id"), col("payload").cast("string").as("text")),
      "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 3L), (2L, 1L, 3L), (4L, 1L, 3L), (3L, 3L, 1L)))
  }
}
