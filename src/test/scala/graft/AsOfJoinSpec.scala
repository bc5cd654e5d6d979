package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, l_id) left / (key, ts, r_id, payload) right
  private def ts(s: Int) = new java.sql.Timestamp(1704067200000L + s * 1000L)

  test("lastPrior equals the brute-force greatest-prior computation") {
    val left = Seq(
      ("a", ts(5), 1L), ("a", ts(10), 2L), ("a", ts(2), 3L),
      ("b", ts(7), 4L), ("b", ts(1), 5L), ("c", ts(9), 6L))
      .toDF("k", "ts", "l_id")
    val right = Seq(
      ("a", ts(3), 100L, 1.5), ("a", ts(5), 101L, 2.5), ("a", ts(9), 102L, 3.5),
      ("b", ts(2), 103L, 4.5))
      .toDF("k", "ts", "r_id", "pay")

    val got = AsOfJoin.lastPrior(left, right, Seq("k"), "ts", Seq("r_id", "pay"))
      .select("l_id", "r_id", "pay").as[(Long, Long, Double)].collect().toSet

    // brute force: for each left row, the right row with max ts <= l.ts
    val l = left.as[(String, java.sql.Timestamp, Long)].collect()
    val r = right.as[(String, java.sql.Timestamp, Long, Double)].collect()
    val expect = l.flatMap { case (k, t, id) =>
      val cands = r.filter(x => x._1 == k && !x._2.after(t))
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(_._2.getTime)
        Some((id, best._3, best._4))
      }
    }.toSet
    // ties at equal ts (l_id=1 at ts 5 matches r ts 5 — ASOF <= rule)
    assert(expect.exists(_._1 == 1L) && expect.find(_._1 == 1L).get._2 == 101L)
    // no prior right row → dropped (l_id=3 precedes all 'a' rights? ts(2) < ts(3): yes; c has none)
    assert(!got.exists(_._1 == 3L) && !got.exists(_._1 == 6L))
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("NULL payload values are carried faithfully, from one right row") {
    // right row at ts 5 has pay=null but a real r_id: a left row after it
    // must receive (101, null) — never r_id from one row and pay from
    // another, never be dropped for the null (round-4 ADVICE)
    val left = Seq(("a", ts(6), 1L), ("a", ts(4), 2L)).toDF("k", "ts", "l_id")
    val right = Seq(
      ("a", ts(3), 100L, Some(1.5)), ("a", ts(5), 101L, None: Option[Double]))
      .toDF("k", "ts", "r_id", "pay")
    val got = AsOfJoin.lastPrior(left, right, Seq("k"), "ts", Seq("r_id", "pay"))
      .select("l_id", "r_id", "pay")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(got == Set((1L, 101L, None), (2L, 100L, Some(1.5))), got)
  }

  test("sharded hot-key as-of equals the unsharded join on a skewed fixture") {
    // one hot key with 2000 events + a handful of cold keys; several
    // bucket widths, incl. one so narrow most buckets need seeding and
    // one so wide sharding degenerates to the plain join
    val left = spark.range(2000).select(
        when(col("id") % 10 === 0, concat(lit("cold"), (col("id") % 7).cast("string"))).otherwise("hot").as("k"),
        (col("id") * 3 % 5000).cast("timestamp").as("ts"),
        col("id").as("l_id"))
    val right = spark.range(300).select(
        when(col("id") % 9 === 0, concat(lit("cold"), (col("id") % 7).cast("string"))).otherwise("hot").as("k"),
        (col("id") * 17 % 5000).cast("timestamp").as("ts"),
        col("id").as("r_id"),
        (col("id") * 1.5).as("pay"))
      .groupBy("k", "ts") // dedupe per (key, ts) as the contract requires
      .agg(min("r_id").as("r_id"), min("pay").as("pay"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_id", "r_id", "pay")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val base = canon(AsOfJoin.lastPrior(left, right, Seq("k"), "ts", Seq("r_id", "pay")))
    assert(base.nonEmpty)
    for (w <- Seq(7L, 100L, 1000000L)) {
      val sharded = canon(AsOfJoin.lastPriorSharded(
        left, right, Seq("k"), "ts", Seq("r_id", "pay"), bucketSeconds = w))
      assert(sharded == base, s"bucketSeconds=$w diverged")
    }
  }

  test("lastPriorSharded fails fast on a payload/left column collision") {
    val left = Seq(("a", ts(5), 9.9)).toDF("k", "ts", "pay")
    val right = Seq(("a", ts(3), 1.5)).toDF("k", "ts", "pay")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.lastPriorSharded(left, right, Seq("k"), "ts", Seq("pay"), 3600L)
    }
    assert(e.getMessage.contains("collides"))
  }

  test("one shuffle: no cartesian/range explosion in the plan") {
    val left = spark.range(100).select(
      (col("id") % 5).cast("string").as("k"),
      col("id").cast("timestamp").as("ts"), col("id").as("l_id"))
    val right = spark.range(50).select(
      (col("id") % 5).cast("string").as("k"),
      (col("id") * 2).cast("timestamp").as("ts"), col("id").as("r_id"))
    val out = AsOfJoin.lastPrior(left, right, Seq("k"), "ts", Seq("r_id"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), "range join exploded")
    assert(!plan.contains("Join"), "as-of should be union+window, not a join")
    assert(out.count() > 0)
  }
}
