package graft.operators

import graft.functions.TopKAgg
import org.apache.spark.sql.graft.GraftFunctions
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force top-k is the exact baseline: broadcast the (small) query
  * set against the (huge) corpus — one map-only pass computing cosine via
  * the codegen'd CosineSim expression, then the typed TopKAgg so only k
  * rows per query cross the shuffle (no global sort, no per-query window
  * over the whole corpus).
  *
  * The scale path is random-hyperplane LSH: bucket corpus + queries by
  * sign-pattern bands, rerank candidates exactly. Approximate (recall
  * property-tested in AnnSpec), zero full-corpus scan per query once the
  * bucketed corpus is materialized.
  */
object Ann {

  /** Exact top-k neighbors for each query. Cosine is rounded to `roundTo`
    * decimals BEFORE ranking so ordering is reproducible across engines
    * (ties broken by corpus id asc). Output: (q_id, rank, id, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     roundTo: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scored = corpus.select(col("id"), col("vec"))
      .crossJoin(broadcast(queries.select(col("id").as("q_id"), col("vec").as("q_vec"))))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"),
              round(GraftFunctions.cosineSim(col("vec"), col("q_vec")), roundTo).as("cos"),
              col("id"))
    val topk = new TopKAgg(k).toColumn
    scored.as[(Long, Double, Long)]
      .map { case (q, c, id) => (q, (c, f"$id%012d")) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(topk.name("top"))
      .toDF("q_id", "top")
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("q_id"), (col("rank0") + 1).cast("long").as("rank"),
              col("hit._2").cast("long").as("id"), col("hit._1").as("cos"))
  }

  /** Deterministic random-hyperplane sign bits of a vector (seeded). */
  def signBits(vec: Array[Float], nBits: Int, dim: Int): Long = {
    var bits = 0L
    var b = 0
    while (b < nBits) {
      val hp = graft.functions.MinHash.hashEmbeddingCached(s"hp$b", dim)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += vec(i) * hp(i); i += 1 }
      if (dot > 0) bits |= (1L << b)
      b += 1
    }
    bits
  }

  /** Approximate top-k via random-hyperplane LSH: `bands` bands of `rows`
    * sign bits each; candidates = corpus rows sharing any band bucket with
    * the query; exact cosine rerank on candidates only. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bands: Int = 8, rows: Int = 4, roundTo: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nBits = bands * rows
    def bucketize(df: DataFrame, idName: String): DataFrame =
      df.select(col("id"), col("vec")).as[(Long, Array[Float])]
        .flatMap { case (id, vec) =>
          val bits = signBits(vec, nBits, vec.length)
          (0 until bands).map { b =>
            val band = (bits >>> (b * rows)) & ((1L << rows) - 1)
            (s"$b:$band", id)
          }
        }.toDF("bucket", idName)

    val corpusBuckets = bucketize(corpus, "id")
    val queryBuckets = bucketize(queries, "q_id")
    val cand = queryBuckets.join(corpusBuckets, "bucket")
      .where(col("id") =!= col("q_id"))
      .select("q_id", "id").distinct()

    val scored = cand
      .join(corpus.select(col("id"), col("vec")), "id")
      .join(broadcast(queries.select(col("id").as("q_id"), col("vec").as("q_vec"))), "q_id")
      .select(col("q_id"),
              round(GraftFunctions.cosineSim(col("vec"), col("q_vec")), roundTo).as("cos"),
              col("id"))
    val topk = new TopKAgg(k).toColumn
    scored.as[(Long, Double, Long)]
      .map { case (q, c, id) => (q, (c, f"$id%012d")) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(topk.name("top"))
      .toDF("q_id", "top")
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank0", "hit")))
      .select(col("q_id"), (col("rank0") + 1).cast("long").as("rank"),
              col("hit._2").cast("long").as("id"), col("hit._1").as("cos"))
  }
}
