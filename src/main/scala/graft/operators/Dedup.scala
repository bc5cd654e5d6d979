package graft.operators

import graft.functions.{MinHash, TextFns}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deduplication family for large-scale text corpora — the training-data-
  * pipeline operators layered on the same MinHash/SimHash kernels the ER
  * blocking uses. All operators take (id, text) and emit deterministic
  * results (seeded hash families, explicit tie-breaks).
  *
  * Scale notes: exact dedup is one hash-groupBy (map-side partial agg);
  * minhash/simhash near-dup is map (signatures) → explode(bands) →
  * self-join per band key → verify-join back to shingle sets. Signatures,
  * not documents, cross the band shuffle; full shingle arrays travel only
  * for verified candidate ids (two hash joins).
  */
object Dedup {

  /** Exact duplicate groups by content hash. Output: one row per input id
    * with its canonical representative (min id in the group) and group
    * size — the standard "keep one copy" shape. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), md5(col(textCol)).as("sig"))
    val groups = withSig.groupBy("sig")
      .agg(min("id").as("rep_id"), count(lit(1)).as("group_size"))
    withSig.join(groups, "sig").select("id", "rep_id", "group_size")
  }

  /** Word n-gram shingle set of a text, sorted distinct. */
  def shingles(text: String, n: Int): Seq[String] = {
    val toks = TextFns.TokenPattern.r.findAllIn(text.toLowerCase).toArray
    if (toks.length < n) Seq(toks.mkString(" "))
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).distinct.sorted
  }

  /** MinHash-LSH near-duplicate pairs, verified by true shingle-set
    * Jaccard ≥ `threshold`. Output: (a_id, b_id, jaccard rounded 4dp),
    * a_id < b_id. LSH (bands×rows) is the candidate filter; the verify
    * join makes the result exact-on-candidates, and band parameters are
    * sized so P(miss) at the threshold is negligible (e.g. 16×8 at
    * j≥0.9 → miss ≈ 1e-9). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, k: Int = 128,
                   bands: Int = 16, rows: Int = 8,
                   threshold: Double = 0.6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val docs = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
    val withShingles = docs.map { case (id, text) =>
      (id, shingles(text, shingleN).toArray)
    }.toDF("id", "sh")

    val bandKeys = docs.flatMap { case (id, text) =>
      val sh = shingles(text, shingleN)
      val sig = MinHash.signature(sh, k)
      MinHash.bandKeys(sig, bands, rows).map(bk => (bk, id))
    }.toDF("band_key", "id")

    val cand = bandKeys.as("L").join(bandKeys.as("R"), Seq("band_key"))
      .where(col("L.id") < col("R.id"))
      .select(col("L.id").as("a_id"), col("R.id").as("b_id"))
      .distinct()

    cand
      .join(withShingles.select(col("id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(withShingles.select(col("id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(when(col("uni") > 0, col("inter") / col("uni")).otherwise(0.0), 4))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit simhash over word shingles,
    * candidates from 4×16-bit chunk equality (any pair within Hamming
    * distance ≤ 3 shares at least one exact chunk — pigeonhole), verified
    * by exact Hamming distance ≤ `maxHamming`. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for distance <= 3")
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, MinHash.simHash(shingles(text, shingleN))) }
      .toDF("id", "sim")

    val chunks = sigs.as[(Long, Long)].flatMap { case (id, sim) =>
      (0 until 4).map(c => (s"$c:${(sim >>> (c * 16)) & 0xffffL}", id, sim))
    }.toDF("chunk_key", "id", "sim")

    chunks.as("L").join(chunks.as("R"), Seq("chunk_key"))
      .where(col("L.id") < col("R.id"))
      .select(col("L.id").as("a_id"), col("R.id").as("b_id"),
              col("L.sim").as("sim_a"), col("R.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }
}
