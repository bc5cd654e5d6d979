package graft

import graft.operators.TfIdf
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "spark spark spark cluster"),
    (2L, "spark cluster cluster join"),
    (3L, "entity resolution join")
  ).toDF("doc_id", "text")

  test("corpus-specific high-tf terms outrank universal ones") {
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .select("id", "term", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // doc 1: 'spark' (tf 3, df 2) must rank 1
    assert(top.contains((1L, "spark", 1)))
    // doc 3: all tf 1 — idf decides; 'entity'/'resolution' (df 1) beat 'join' (df 2)
    val d3 = TfIdf.topTerms(docs, "doc_id", "text", k = 3)
      .where(col("id") === 3L).orderBy("rank")
      .select("term").as[String].collect().toSeq
    assert(d3 == Seq("entity", "resolution", "join"))
  }

  test("rank bounds, per-doc uniqueness, and determinism under repartition") {
    val out = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .select("id", "term", "tfidf", "rank")
      .collect().map(_.toSeq).toSet
    assert(out.nonEmpty)
    out.groupBy(_.head).foreach { case (_, rows) =>
      assert(rows.size <= 2)
      assert(rows.map(_.last).toSet.subsetOf(Set[Any](1, 2)))
    }
    val re = TfIdf.topTerms(docs.repartition(7), "doc_id", "text", k = 2)
      .select("id", "term", "tfidf", "rank")
      .collect().map(_.toSeq).toSet
    assert(re == out)
  }
}
