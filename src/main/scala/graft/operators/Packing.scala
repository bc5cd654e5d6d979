package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assemble documents into ≤ maxTokens training bins
  * (the batch-assembly step between a filtered corpus and the trainer;
  * round-4 verdict "Next round" #9). Two strategies with opposite
  * trade-offs:
  *
  * [[packBucketed]] — length-bucketed packing, fully declarative column
  * math: docs are bucketed by token-length band, and a bucket-b bin takes
  * exactly floor(maxTokens / (b·granularity)) docs, so every bin is under
  * budget BY CONSTRUCTION and the whole assignment is a pure function of
  * (id, len) — engine-reproducible (q54 has an exact DuckDB oracle),
  * stable under repartitioning, and embarrassingly parallel: the
  * `shardHexChars` md5 sub-sharding bounds every row_number partition
  * (bucket × shard), so no serial scan exceeds corpus/(buckets·16^chars)
  * rows. Waste is bounded by the band granularity: a doc wastes at most
  * (granularity − 1) + its bin's tail slot, i.e. per-bin fill ≥
  * cap·(b−1)·granularity.
  *
  * [[packGreedy]] — first-fit-decreasing within hash partitions: tighter
  * bins (classic FFD ≤ 11/9·OPT + 1 per partition), order-dependent so
  * NOT SQL-expressible; determinism comes from hash-partitioning on id
  * with a fixed partition count + an in-partition (len desc, id) sort,
  * and is property-gated in PackingSpec together with the budget and
  * fill-quality bounds. mapPartitions is justified here: bin state is
  * inherently sequential per partition, and only (id, len) slim rows
  * ever shuffle.
  */
object Packing {

  /** Length-bucketed packing. Output: (id, tok_len, bin_key) for every
    * doc with 1 ≤ tok_len ≤ maxTokens (longer docs can't fit any bin and
    * are excluded — count them upstream if lineage requires).
    *
    * @param granularity   length-band width; `bucket = ceil(len/g)`
    * @param shardHexChars md5 hex chars sub-sharding each bucket's
    *                      row_number partition (0 = none, 1 = 16 shards,
    *                      2 = 256 …). Bins never cross shards, so waste
    *                      is unchanged; the serial window scan per
    *                      partition shrinks 16^chars-fold. */
  def packBucketed(df: DataFrame, idCol: String, textCol: String,
                   maxTokens: Int, granularity: Int,
                   shardHexChars: Int = 0): DataFrame = {
    require(maxTokens >= granularity && granularity > 0, "need maxTokens >= granularity > 0")
    val len = TextFns.bpeishTokenCount(col(textCol)).cast("bigint")
    val withLen = df
      .select(col(idCol).as("id"), len.as("tok_len"))
      .where(col("tok_len") >= 1 && col("tok_len") <= maxTokens)
      .withColumn("bucket", ceil(col("tok_len").cast("double") / granularity).cast("bigint"))
      .withColumn("shard",
        if (shardHexChars > 0)
          substring(md5(col("id").cast("string")), 1, shardHexChars)
        else lit(""))
    val w = Window.partitionBy("bucket", "shard").orderBy("id")
    withLen
      .withColumn("rn", row_number().over(w).cast("bigint") - 1)
      .withColumn("cap",
        greatest(floor(lit(maxTokens.toDouble) / (col("bucket") * granularity)), lit(1.0))
          .cast("bigint"))
      .withColumn("bin_key",
        concat(lit("b"), col("bucket"), lit(":s"), col("shard"), lit(":"),
               floor(col("rn") / col("cap")).cast("bigint")))
      .select(col("id"), col("tok_len"), col("bin_key"))
  }

  /** First-fit-decreasing packing within `numPartitions` hash partitions
    * of the id. Output: (id, len, bin_key). Deterministic for a fixed
    * partition count; bins are tight (FFD) but the assignment is order-
    * dependent — property-gated, not SQL-oracled. */
  def packGreedy(df: DataFrame, idCol: String, lenCol: String,
                 maxTokens: Int, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(lenCol).cast("bigint").as("len"))
      .where(col("len") >= 1 && col("len") <= maxTokens)
      .repartition(numPartitions, col("id"))
      .sortWithinPartitions(desc("len"), asc("id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { case (id, len) =>
          val i = remaining.indexWhere(_ >= len) // first fit
          val bin =
            if (i >= 0) { remaining(i) -= len; i }
            else { remaining += (maxTokens - len); remaining.length - 1 }
          (id, len, s"p$pid:$bin")
        }
      }
      .toDF("id", "len", "bin_key")
  }
}
