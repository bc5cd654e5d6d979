package graft

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Reference CC by union-find on the driver. */
  def ufComponents(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical id = min member id
    val groups = nodes.groupBy(find)
    groups.flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }.toMap
  }

  /** Every check runs BOTH physical paths: the driver union-find shortcut
    * (default — these graphs are under the limit) and the distributed
    * large/small-star loop (forced with driverEdgeLimit = 0). Identical
    * output is the contract of the scale-adaptive switch. */
  def check(edges: Seq[(String, String)]): Unit = {
    val want = ufComponents(edges)
    val viaDriver = Clustering.connectedComponents(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    assert(viaDriver == want, "driver union-find path diverged")
    val viaLoop = Clustering.connectedComponents(edges.toDF("src", "dst"),
        driverEdgeLimit = 0L)
      .as[(String, String)].collect().toMap
    assert(viaLoop == want, "distributed star-loop path diverged")
  }

  test("chain, star, triangle, two components") {
    check(Seq("a" -> "b", "b" -> "c", "c" -> "d"))            // chain
    check(Seq("hub" -> "s1", "hub" -> "s2", "hub" -> "s3"))   // star
    check(Seq("x" -> "y", "y" -> "z", "z" -> "x"))            // triangle
    check(Seq("a" -> "b", "c" -> "d"))                        // 2 comps
  }

  test("duplicate and reversed edges, self-loops are harmless") {
    check(Seq("a" -> "b", "b" -> "a", "a" -> "b", "a" -> "a", "c" -> "c", "c" -> "d"))
  }

  test("long path converges (log-round behavior, bounded iterations)") {
    val n = 200
    val path = (0 until n).map(i => (f"n$i%04d", f"n${i + 1}%04d"))
    check(path)
  }

  test("random graphs match union-find") {
    val rng = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val nodes = (0 until 80).map(i => f"v$i%03d")
      val edges = (1 to 100).map { _ =>
        (nodes(rng.nextInt(nodes.length)), nodes(rng.nextInt(nodes.length)))
      }.filter(e => e._1 != e._2)
      check(edges)
    }
  }

  test("empty edge set → empty assignment") {
    val empty = spark.emptyDataset[(String, String)].toDF("src", "dst")
    assert(Clustering.connectedComponents(empty).count() == 0)
  }

  test("output is a valid partition: every node exactly one cluster, min-id canonical") {
    val rng = new scala.util.Random(7)
    val edges = (1 to 150).map { _ => (f"v${rng.nextInt(60)}%03d", f"v${rng.nextInt(60)}%03d") }
      .filter(e => e._1 != e._2)
    val assign = Clustering.connectedComponents(edges.toDF("src", "dst"),
        driverEdgeLimit = 0L) // exercise the distributed path's invariants
      .as[(String, String)].collect()
    val byNode = assign.groupBy(_._1)
    assert(byNode.values.forall(_.length == 1), "a node has 2 cluster ids")
    // cluster id must be a member of its own cluster and the minimum
    val byCluster = assign.groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1).toSet }
    byCluster.foreach { case (c, members) =>
      assert(members.contains(c) && members.min == c)
    }
    // no edge crosses clusters
    val m = assign.toMap
    edges.foreach { case (a, b) => assert(m(a) == m(b), s"edge ($a,$b) crosses clusters") }
  }
}
