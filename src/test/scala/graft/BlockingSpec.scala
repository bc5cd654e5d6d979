package graft

import graft.model._
import graft.operators.Blocking
import org.apache.spark.sql.functions._

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  def mention(id: Int, norm: String): Mention =
    Mention(f"m$id%05d", "c", 0, 0, 1, norm, norm,
            Array(Candidate("e", 1.0)), Array(0.1f, 0.2f), "e", 1.0)

  /** Random keyed frame with deliberate hot keys. */
  def keyedFixture(seed: Int, n: Int, nKeys: Int, hotShare: Double) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val key = if (rng.nextDouble() < hotShare) "hot" else s"k${rng.nextInt(nKeys)}"
      (key, mention(i, s"norm$i"))
    }.toDF("block_key", "m")
  }

  test("salted pair set equals naive pair set (hot + cold keys)") {
    val keyed = keyedFixture(42, 400, 20, 0.4).cache()
    val naive = Blocking.naivePairs(keyed)
      .select(col("a.mention_id"), col("b.mention_id")).as[(String, String)]
      .collect().toSet
    // tau small → the hot key (≈160 rows) takes the salted triangle path
    val salted = Blocking.candidatePairs(keyed, tau = 30, blockMaxSize = 100000)
      .select(col("a.mention_id"), col("b.mention_id")).as[(String, String)]
      .collect().toSet
    assert(salted == naive)
    assert(naive.nonEmpty)
    // pairs are canonical and unique
    assert(salted.forall { case (a, b) => a < b })
  }

  test("a mention in multiple blocks yields each pair once") {
    val keyed = Seq(
      ("k1", mention(1, "x")), ("k1", mention(2, "y")),
      ("k2", mention(1, "x")), ("k2", mention(2, "y")),
    ).toDF("block_key", "m")
    val pairs = Blocking.candidatePairs(keyed, tau = 10, blockMaxSize = 100)
    assert(pairs.count() == 1)
  }

  test("blockMaxSize drops oversized blocks entirely") {
    val keyed = (0 until 50).map(i => ("huge", mention(i, s"n$i"))).toDF("block_key", "m")
    assert(Blocking.candidatePairs(keyed, tau = 10, blockMaxSize = 49).count() == 0)
    assert(Blocking.candidatePairs(keyed, tau = 10, blockMaxSize = 50).count() == 50L * 49 / 2)
  }

  test("block keys contain exact norm, LSH band, and candidate-entity keys") {
    val ms = Seq(mention(1, "bakozu corp")).toDS()
    val keys = Blocking.withBlockKeys(ms).select("block_key").as[String].collect()
    assert(keys.contains("nm:bakozu corp"))
    assert(keys.contains("ent:e"))
    assert(keys.count(_.startsWith("b")) == 16) // 16 bands of 2 rows
  }

  test("typo'd variants share at least one block key (LSH recall path)") {
    val ms = Seq(mention(1, "bakozu corp"), mention(2, "bakzou corp")).toDS()
    val keyed = Blocking.withBlockKeys(ms)
    val shared = keyed.groupBy("block_key").count().where(col("count") === 2)
    assert(shared.count() >= 1)
  }
}
