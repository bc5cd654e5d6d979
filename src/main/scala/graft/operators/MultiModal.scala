package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride through the engine
  * as opaque `binary` columns with a typed metadata struct; every relational
  * operator (dedup, filtering, partitioning, checkpointing) treats them as
  * bytes + metadata, never decoding in the relational path.
  *
  * The decode/feature-extract step is the ONLY modality-aware stage and it
  * is deliberately isolated behind [[decodeFeatures]]: a mapPartitions
  * batch transform with the schema/batching/partitioning of a real decoder.
  * The image/audio codecs are NOT in this container, so the byte→features
  * kernel is a clearly-marked deterministic STUB (see decodeStub) — the
  * Spark-side plumbing (binary column handling, batch shape, output
  * schema, dedup-before-decode ordering) is real and tested.
  *
  * Scale notes: payloads are the wide column — every transform here keeps
  * them out of shuffles (dedup groups by the 16-byte sha, not the blob;
  * meta derivation is map-only column math). Decode cost is paid AFTER
  * exact dedup, never per duplicate.
  */
object MultiModal {

  val Modalities = Seq("image", "audio", "text")

  /** Synthesize a modality-tagged payload table from a text corpus (the
    * sandbox stand-in for an ingest of real media): payload = UTF-8 bytes,
    * modality assigned deterministically — SQL-reproducible on both
    * engines for the oracle. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(Modalities.map(lit): _*),
        (pmod(col("doc_id") + length(col("source")), lit(3)) + 1).cast("int"))
        .as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Typed metadata struct per payload: byte size, content sha (the dedup
    * key — 16 bytes crossing shuffles instead of the blob), and
    * header-derived dimensions (here: deterministic pseudo-dims from the
    * sha, standing in for a real header parse). Map-only column math. */
  def withMeta(df: DataFrame): DataFrame = {
    val sha = md5(col("payload"))
    df.withColumn("meta", struct(
      length(col("payload")).cast("bigint").as("n_bytes"),
      sha.as("sha"),
      pmod(conv(substring(sha, 1, 4), 16, 10).cast("int"), lit(640)).as("width"),
      pmod(conv(substring(sha, 5, 4), 16, 10).cast("int"), lit(480)).as("height")))
  }

  /** Exact payload dedup: group by content sha (never the blob), keep the
    * min-doc_id representative — the decode stage below runs on
    * representatives only. */
  def dedupByPayload(df: DataFrame): DataFrame = {
    val groups = df.select(col("doc_id").as("id"), col("meta.sha").as("sha"))
      .groupBy("sha").agg(min("id").as("rep_id"), count(lit(1)).as("group_size"))
    df.join(groups, df("meta.sha") === groups("sha"))
      .where(col("doc_id") === col("rep_id"))
      .select(df.columns.map(col) :+ col("group_size"): _*)
  }

  /** STUB byte→feature kernel. A real deployment decodes the payload
    * (image: decode+resize+CNN features; audio: frame-sample+fbank) with a
    * native library; this container has none, so the kernel is a
    * deterministic hash embedding of the content sha — same shape, same
    * determinism, zero codec dependency. Swap THIS function (only) for the
    * real decoder. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val sha = java.security.MessageDigest.getInstance("MD5").digest(payload)
    graft.functions.MinHash.hashEmbedding(
      java.util.Base64.getEncoder.encodeToString(sha), dim)
  }

  /** Batched decode/feature-extract: mapPartitions so a real decoder can
    * amortize model/codec init per PARTITION (the Pandas-UDF batch-shape
    * equivalent in Scala), emitting (doc_id, modality, features[dim]).
    * Runs after [[dedupByPayload]] — duplicates never pay decode. */
  def decodeFeatures(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of the (stub) decoder state happens here
        it.map { case (id, modality, payload) =>
          (id, modality, decodeStub(payload, dim))
        }
      }
      .toDF("doc_id", "modality", "features")
  }
}
