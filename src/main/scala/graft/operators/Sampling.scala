package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training-data
  * pipelines (train/valid/test splits, down-sampling a 100-TB corpus).
  *
  * `rand()`-based `sample()` is the wrong tool at scale: a row's fate
  * depends on seed+partitioning, so a repartition, an AQE re-plan, or an
  * incremental re-run migrates rows between splits (train/test leakage).
  * Here a row's split is a PURE FUNCTION of its key — an interval over
  * the row's md5 cell — so assignment is stable under repartitioning,
  * cluster size, incremental reprocessing, and even engine (md5 and
  * string comparison are engine-reproducible: q45 has an exact DuckDB
  * oracle). Smaller fractions nest inside larger ones by construction
  * (`hashSample(0.1)` ⊆ `hashSample(0.5)`), which is what you want when
  * growing a sampled corpus without reshuffling what was already picked.
  *
  * Granularity is 1/256 (two hex chars of the md5) — ample for split
  * weights; the `seed` string folds into the hash input to decorrelate
  * independent splits over the same keys.
  *
  * NULL keys: md5(null) is null, every interval comparison is null, so
  * `splitLabel` lands them deterministically in the LAST part and
  * `hashSample` never keeps them — filter or coalesce keys upstream if
  * either default is wrong for the dataset.
  */
object Sampling {

  /** The row's hash cell: first two hex chars of md5(key ++ seed) —
    * 256 uniform cells, engine-reproducible. */
  def hashCell(key: Column, seed: String = ""): Column =
    substring(md5(concat(key.cast("string"), lit(seed))), 1, 2)

  // "g" sorts above every 2-hex-char cell ("ff" < "g"): the full-corpus
  // bound must not be the 3-char "100", which sorts BELOW cells a0..ff
  private def bound(cum: Double): String = {
    val cells = math.round(cum * 256).toInt
    if (cells >= 256) "g" else f"$cells%02x"
  }

  /** Split label from (name, weight) parts with weights summing to 1:
    * cumulative md5-cell intervals at 1/256 granularity. */
  def splitLabel(key: Column, parts: Seq[(String, Double)], seed: String = ""): Column = {
    require(parts.nonEmpty, "at least one split part")
    require(math.abs(parts.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val cell = hashCell(key, seed)
    val cums = parts.init.scanLeft(0.0)(_ + _._2).tail // cumulative bounds, last part is `otherwise`
    val cases = parts.init.zip(cums)
    cases.headOption match {
      case None => lit(parts.head._1)
      case Some(((n0, _), c0)) =>
        cases.tail
          .foldLeft(when(cell < bound(c0), n0)) { case (e, ((n, _), c)) =>
            e.when(cell < bound(c), n)
          }
          .otherwise(parts.last._1)
    }
  }

  /** Keep-predicate for a deterministic `frac` sample of the keys. */
  def hashSample(key: Column, frac: Double, seed: String = ""): Column = {
    require(frac >= 0.0 && frac <= 1.0, "frac in [0,1]")
    hashCell(key, seed) < bound(frac)
  }

  /** [[hashSample]] at 16^hexChars-cell granularity. The 2-hex default
    * quantizes fractions below 1/256 to ZERO (a retract-list bench at
    * frac 3e-4 silently sampled an empty set) — pass more hex chars for
    * small fractions. Same mechanics: pure function of (key, seed),
    * stable under repartitioning, smaller fractions nest inside larger
    * ones at the same hexChars. Existing oracles keep the 2-hex
    * [[hashSample]]. */
  def hashSampleAt(key: Column, frac: Double, hexChars: Int,
                   seed: String = ""): Column = {
    require(frac >= 0.0 && frac <= 1.0, "frac in [0,1]")
    require(hexChars >= 1 && hexChars <= 12, "hexChars in [1,12]")
    val cellsTotal = math.pow(16, hexChars.toDouble).toLong
    val cells = math.round(frac * cellsTotal)
    // "g" sorts above every hex cell — the full-keep bound
    val b = if (cells >= cellsTotal) "g"
            else ("%0" + hexChars + "x").format(cells)
    substring(md5(concat(key.cast("string"), lit(seed))), 1, hexChars) < lit(b)
  }

  /** Per-class keep-predicate — class-dependent sampling fractions (e.g.
    * per-language quotas when mixing a training corpus: halve English,
    * quarter the hot crawl source, keep the rest). Classes absent from
    * `fracs` keep `default`. Same md5-cell mechanics as [[hashSample]]:
    * the pick is a pure function of (key, class), per-class samples nest
    * when a fraction is later raised, and rebalancing one class never
    * reshuffles another's picks. */
  def hashSampleStratified(key: Column, cls: Column,
                           fracs: Map[String, Double],
                           default: Double = 1.0,
                           seed: String = ""): Column = {
    require((default +: fracs.values.toSeq).forall(f => f >= 0.0 && f <= 1.0),
      "fractions in [0,1]")
    val boundCol = fracs.toSeq.sortBy(_._1)
      .foldLeft(lit(bound(default))) { case (acc, (c, f)) =>
        when(cls === c, lit(bound(f))).otherwise(acc)
      }
    hashCell(key, seed) < boundCol
  }
}
