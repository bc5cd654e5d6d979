package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)

  private val w = 60L
  private lazy val rows: Seq[(String, java.sql.Timestamp, Long)] = {
    val rnd = new scala.util.Random(42)
    (1 to 400).map { i =>
      (s"k${rnd.nextInt(6)}", ts(rnd.nextInt(5000).toLong), i.toLong)
    } ++ Seq(
      // hand-built boundary cases on their own key:
      ("edge", ts(1000), 1001L), ("edge", ts(1060), 1002L), // exactly windowSec apart
      ("edge", ts(1061), 1003L),                            // windowSec+1 from 1001
      ("edge", ts(1199), 1004L), ("edge", ts(1201), 1005L)) // straddles the bucket edge at 1200
  }

  test("withinWindow equals the brute-force theta join, each pair exactly once") {
    val df = rows.toDF("k", "ts", "id")
    val pairs = RangeJoin.withinWindow(df, df, Seq("k"), "ts", w, "a_", "b_")
      .where(col("a_id") < col("b_id"))
      .select("k", "a_id", "b_id").as[(String, Long, Long)].collect().toSeq
    val got = pairs.toSet
    assert(pairs.size == got.size, "3-way bucket duplication must not emit a pair twice")

    val expect = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._3 < b._3 &&
        math.abs(a._2.getTime / 1000 - b._2.getTime / 1000) <= w
    } yield (a._1, a._3, b._3)).toSet

    assert(got.contains(("edge", 1001L, 1002L)), "exact-boundary pair (Δ=window) must match")
    assert(!got.contains(("edge", 1001L, 1003L)), "Δ=window+1 pair must not match")
    assert(got.contains(("edge", 1004L, 1005L)), "cross-bucket pair must match")
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("two-table form keeps payload columns and prefixes only non-keys") {
    val left = Seq(("k1", ts(10), "L1"), ("k1", ts(500), "L2")).toDF("k", "ts", "tag")
    val right = Seq(("k1", ts(40), 7.5), ("k2", ts(15), 9.9)).toDF("k", "ts", "v")
    val out = RangeJoin.withinWindow(left, right, Seq("k"), "ts", w)
    assert(out.columns.toSet == Set("k", "l_ts", "l_tag", "r_ts", "r_v"))
    val hit = out.select("k", "l_tag", "r_v").as[(String, String, Double)].collect().toSet
    assert(hit == Set(("k1", "L1", 7.5))) // k2 right row never crosses keys; L2 out of window
  }

  test("plans as an equi join — no nested-loop/cartesian explosion") {
    val df = rows.toDF("k", "ts", "id")
    val out = RangeJoin.withinWindow(df, df, Seq("k"), "ts", w, "a_", "b_")
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.toLowerCase.contains("cartesian"), "range join exploded to cartesian")
    assert(!physical.toLowerCase.contains("nestedloop"), "range join planned as nested loop")
  }
}
