package graft.operators

import graft.functions.MinHash
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Blocking stage: candidate keys per mention + skew-safe pair generation
  * (SURVEY.md §3 Stage A/B, north_rule "blocking stage derives candidate
  * keys per turn via REL-style mention detection combined with MinHash-LSH
  * token blocking").
  *
  * Key families per mention:
  *   - "nm:<norm>"          exact normalized-surface key (REL's dictionary
  *                          key — recall 1.0 for identical surfaces)
  *   - "b<i>:<hash>"        MinHash-LSH band keys over character 3-grams of
  *                          the normalized surface (recall for typo'd /
  *                          abbreviated variants that miss the exact key)
  *
  * Pair generation is a self-equi-join on block_key. At 10^12-turn scale a
  * plain join dies on hot keys, so keys are split into a cold path (plain
  * sort-merge self-join, AQE skew-join as backstop) and a hot path
  * (triangle-distribution salted self-join) plus a hard `blockMaxSize` cap
  * (meta-blocking style: a key shared by millions of mentions carries ~no
  * signal and O(n²) cost).
  */
object Blocking {

  case class LshConfig(k: Int = 32, bands: Int = 16, rows: Int = 2, charNgram: Int = 3)

  /** Explode each mention into (block_key, mention) rows. Map-only.
    * Third key family "ent:<candidate entity>" is REL's own blocking
    * semantics: two surface forms that share a candidate entity in the
    * p(e|m) dictionary land in the same block, so in-dictionary variants
    * (typos, abbreviations, aliases) have recall 1.0 independent of LSH. */
  def withBlockKeys(mentions: Dataset[Mention], lsh: LshConfig = LshConfig()): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions.flatMap { m =>
      val exact = "nm:" + m.norm
      val shingles = MinHash.charNgrams(m.norm, lsh.charNgram)
      val sig = MinHash.signature(shingles, lsh.k)
      val bandKeys = MinHash.bandKeys(sig, lsh.bands, lsh.rows)
      val entKeys = m.candidates.map(c => "ent:" + c.entity)
      (exact +: (bandKeys ++ entKeys).toSeq).distinct.map(k => (k, m))
    }.toDF("block_key", "m")
  }

  /** Distinct candidate pairs (a.mention_id < b.mention_id, exactly once)
    * from (block_key, m) rows.
    *
    * Hot keys (count > tau) use a triangle-distribution salted self-join:
    * rows of a key are split into g = ceil(count/tau) salt groups by
    * hash(id); reducer (i, j), i <= j, compares group i against group j, so
    * no single task sees more than ~2·tau rows of one key. Each row is
    * replicated g+1 times — the standard cost of skew-free O(n²) pair work.
    * Cold keys take a plain self-join (no replication). Pair-set equality
    * with the naive join is property-tested in BlockingSpec.
    *
    * Keys with count > blockMaxSize are dropped (oversized-block discard).
    */
  def candidatePairs(keyed: DataFrame, tau: Int = 2000,
                     blockMaxSize: Int = 200000): DataFrame = {
    val counts = keyed.groupBy("block_key")
      .agg(count(lit(1)).as("key_n"))
      .where(col("key_n") >= 2 && col("key_n") <= blockMaxSize)

    val rows = keyed.join(counts, Seq("block_key"))

    val cold = rows.where(col("key_n") <= tau).select(col("block_key"), col("m"))
    val coldPairs = cold.as("L").join(cold.as("R"), Seq("block_key"))
      .where(col("L.m.mention_id") < col("R.m.mention_id"))
      .select(col("L.m").as("a"), col("R.m").as("b"))

    val hot = rows.where(col("key_n") > tau)
      .withColumn("n_groups", ceil(col("key_n").cast("double") / tau).cast("int"))
      .withColumn("grp", pmod(xxhash64(col("m.mention_id")), col("n_groups")).cast("int"))
    // Row in salt group g is the LEFT input of reducers (g, j), j in
    // [g, G-1], and the RIGHT input of reducers (i, g), i in [0, g].
    val lhs = hot
      .withColumn("j", explode(sequence(col("grp"), col("n_groups") - 1)))
      .select(col("block_key"), col("grp").as("i"), col("j"), col("m").as("a"))
    val rhs = hot
      .withColumn("i", explode(sequence(lit(0), col("grp"))))
      .select(col("block_key"), col("i"), col("grp").as("j"), col("m").as("b"))
    val hotPairs = lhs.join(rhs, Seq("block_key", "i", "j"))
      .where(col("i") < col("j") || col("a.mention_id") < col("b.mention_id"))
      .select(col("a"), col("b"))

    // The same pair can arrive via several block keys (exact + LSH bands)
    // and, on the hot path, with a/b in either order — canonicalize then
    // dedupe on the id pair.
    coldPairs.union(hotPairs)
      .select(
        when(col("a.mention_id") <= col("b.mention_id"), col("a")).otherwise(col("b")).as("a"),
        when(col("a.mention_id") <= col("b.mention_id"), col("b")).otherwise(col("a")).as("b"))
      .withColumn("a_id", col("a.mention_id"))
      .withColumn("b_id", col("b.mention_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a"), col("b"))
  }

  /** Naive reference pair generator (testing only): plain self-join. */
  def naivePairs(keyed: DataFrame): DataFrame = {
    val l = keyed.select(col("block_key"), col("m").as("a"))
    val r = keyed.select(col("block_key"), col("m").as("b"))
    l.as("L").join(r.as("R"), Seq("block_key"))
      .where(col("a.mention_id") < col("b.mention_id"))
      .withColumn("a_id", col("a.mention_id"))
      .withColumn("b_id", col("b.mention_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a"), col("b"))
  }
}
