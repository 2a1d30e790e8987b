package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, content-addressed sampling.
  *
  * RNG-based samplers (`df.sample`, `sampleBy`) are seeded per
  * partition: the selected rows change under repartitioning, retries,
  * or engine differences — useless for reproducible training-data
  * curation. Here membership is a pure function of the row's KEY
  * (md5-derived uniform), so a row's fate is identical on any engine,
  * any partitioning, any rerun, and samples are consistent across
  * tables sharing the key (the join of two 10% samples is the 10%
  * sample of the join).
  *
  * The hash is a narrow map — no shuffle, no state; at 100 TB this is
  * a pushdown-friendly filter like any other.
  */
object Sampling {

  /** md5-derived uniform in [0, 1000) milli-units, exact in any
    * engine: ('0x' || substr(md5(key), 1, 8))::BIGINT % 1000.
    */
  def hashMilli(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast(LongType) % 1000

  /** Keep rows whose key hashes under `rateMilli` (per-mill). */
  def deterministicSample(df: DataFrame, keyCol: String, rateMilli: Int): DataFrame =
    df.where(hashMilli(col(keyCol)) < rateMilli)

  /** Stratified variant: per-stratum keep rates (per-mill), e.g. to
    * rebalance languages in a training corpus. Unlisted strata get
    * `defaultMilli`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       ratesMilli: Map[String, Int],
                       defaultMilli: Int = 0): DataFrame = {
    val rate = ratesMilli.toSeq.sortBy(_._1).foldLeft(lit(defaultMilli)) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.where(hashMilli(col(keyCol)) < rate)
  }
}
