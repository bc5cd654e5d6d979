package graft

import graft.operators.Constraints
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  // two scored components {1,2} and {3,4}, singleton 9 outside the graph
  private lazy val edges = Seq(("01", "02"), ("03", "04")).toDF("src", "dst")

  test("must-link merges otherwise-separate components, transitively") {
    val ml = Seq(("02", "03")).toDF("src", "dst")
    val got = Constraints.clusterWithMustLink(edges, ml)
      .as[(String, String)].collect().toMap
    assert(Set("01", "02", "03", "04").map(got) == Set("01"),
      "must-link must fuse both scored components into one cluster")
  }

  test("empty must-link leaves the clustering unchanged") {
    val ml = spark.emptyDataset[(String, String)].toDF("src", "dst")
    val base = operators.Clustering.connectedComponents(edges)
      .as[(String, String)].collect().toSet
    val got = Constraints.clusterWithMustLink(edges, ml)
      .as[(String, String)].collect().toSet
    assert(got == base)
  }

  test("violations: same-cluster pairs only; orientation and dups folded; absent nodes skipped") {
    val assign = operators.Clustering.connectedComponents(edges)
    val cl = Seq(
      ("02", "01"), // violated (reversed orientation)
      ("01", "02"), // dup of the above
      ("01", "03"), // cross-cluster: not violated
      ("01", "09")  // 09 never entered the graph: not emitted
    ).toDF("src", "dst")
    val got = Constraints.violations(assign, cl)
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("01", "02", "01")))
  }
}
