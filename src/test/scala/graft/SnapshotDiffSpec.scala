package graft

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  val oldSnap = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta")
  ).toDF("doc_id", "text")
  val newSnap = Seq(
    (1L, "alpha"),          // unchanged → excluded
    (2L, "bravo v2"),       // changed
    (4L, "delta"),          // unchanged → excluded
    (5L, "echo")            // added
  ).toDF("doc_id", "text")  // 3 removed

  test("diff classifies added/removed/changed and drops the unchanged majority") {
    val d = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }

  test("sig columns carry the side evidence: null exactly on the absent side") {
    val rows = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => (r.getString(1), r.isNullAt(2), r.isNullAt(3))).toSet
    assert(rows == Set(("changed", false, false),
                       ("removed", false, true),
                       ("added", true, false)))
  }

  test("null text is a value, not absence: unchanged-null excluded, null transitions classified") {
    val o = Seq((1L, Option("alpha")), (2L, Option.empty[String]),
                (3L, Option.empty[String])).toDF("doc_id", "text")
    val n = Seq((1L, Option("alpha")), (2L, Option.empty[String]),
                (4L, Option.empty[String])).toDF("doc_id", "text")
    val d = SnapshotDiff.diff(o, n, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 2 (null -> null) is unchanged, NOT 'added'; 3 (null text removed)
    // is 'removed'; 4 (added with null text) is 'added'
    assert(d == Map(3L -> "removed", 4L -> "added"))
    val chg = SnapshotDiff.diff(o,
        Seq((2L, Option("now real"))).toDF("doc_id", "text"), "doc_id", "text")
      .where($"id" === 2L).collect().map(_.getString(1)).toSeq
    assert(chg == Seq("changed"), "null -> real text must read as changed")
  }

  test("identical snapshots diff to empty; disjoint snapshots to full") {
    assert(SnapshotDiff.diff(oldSnap, oldSnap, "doc_id", "text").isEmpty)
    val disjoint = SnapshotDiff.diff(
      oldSnap.where($"doc_id" <= 2), oldSnap.where($"doc_id" >= 3)
        .withColumnRenamed("text", "text"), "doc_id", "text")
    val st = disjoint.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "removed", 2L -> "removed", 3L -> "added", 4L -> "added"))
  }
}
