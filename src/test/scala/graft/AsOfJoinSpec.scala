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
