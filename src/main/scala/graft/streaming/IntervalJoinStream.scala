package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ops.IntervalJoin.overlapJoin]] — built
  * on Spark's NATIVE watermarked stream-stream join rather than
  * custom state (the extension-ladder rule: the built-in operator
  * expresses the semantics, so no mapGroupsWithState here; contrast
  * [[AsOfStream]], whose "latest right <= leftTs" semantics no
  * built-in join shape covers).
  *
  * The reduction: Spark's stream-stream join requires (a) at least
  * one EQUALITY predicate (state is hash-partitioned on it) and (b) a
  * time-range condition between the two sides' event-time columns
  * (state cleanup). Both fall out of bounded interval length
  * `maxLen`:
  *
  *  - overlap (`aS <= bE && bS <= aE`) between intervals of length
  *    <= maxLen implies `|aS - bS| <= maxLen` — the range condition;
  *  - bucketing starts by width maxLen
  *    (`bucket = floor(startMicros / maxLenMicros)`) then makes
  *    `|aS - bS| <= maxLen` imply
  *    `bucket(bS) ∈ {bucket(aS)-1, bucket(aS), bucket(aS)+1}`, so
  *    replicating the LEFT side into its 3 adjacent buckets and
  *    joining on bucket equality loses nothing — and since exactly
  *    ONE replica carries `bucket(aS)+k == bucket(bS)`, no pair is
  *    emitted twice (no streaming dedup state needed).
  *
  * The exact overlap predicate then filters candidates, so the output
  * is exactly the overlap pairs. State per side is O(rows inside
  * watermark + maxLen + delay) — the in-flight window, not stream
  * history — and the ×3 replication is on in-flight rows only.
  *
  * == Contract ==
  * Interval length <= `maxLenSec` on BOTH sides: a longer interval's
  * matches fall outside the bucket/range bound and would be silently
  * absent — split long intervals upstream. The caveat is
  * load-bearing for correctness here, so violators FAIL the query
  * instead: the length check is fused into the join-key bucket
  * column itself (`coalesce(assert_true(len_ok), bucket)`), which the
  * join consumes — column pruning can't elide it. Both inputs carry
  * TimestampType `startCol`/`endCol` (inclusive, end >= start);
  * watermarks with `delay` lateness are applied here.
  *
  * Output: every column of `a` prefixed `a_`, of `b` prefixed `b_`,
  * plus exact integer `overlap_us` — the batch operator's shape, so
  * `IntervalJoinStreamSpec` pins stream == batch brute force across
  * micro-batch splits.
  */
object IntervalJoinStream {

  def overlapJoin(a: DataFrame, b: DataFrame, startCol: String,
                  endCol: String, maxLenSec: Long,
                  delay: String): DataFrame = {
    require(maxLenSec >= 1, s"maxLenSec must be >= 1 (got $maxLenSec)")
    def prep(df: DataFrame, p: String): DataFrame =
      df.select(df.columns.map(c => col(c).as(s"$p$c")): _*)
        .withWatermark(s"$p$startCol", delay)
    // the length contract rides the join key so it is always
    // evaluated: assert_true yields NULL when satisfied (falling
    // through to the bucket), raises when violated
    def bucket(p: String): Column = {
      val lenOk = col(s"$p$endCol") <= col(s"$p$startCol") +
        expr(s"INTERVAL $maxLenSec SECONDS")
      coalesce(
        assert_true(lenOk, lit(
          s"IntervalJoinStream: interval longer than maxLen=" +
            s"${maxLenSec}s on side '$p' — split long intervals upstream"))
          .cast("bigint"),
        expr(s"CAST(FLOOR(unix_micros($p$startCol) / " +
          s"(${maxLenSec} * 1000000.0)) AS BIGINT)"))
    }
    val aa = prep(a, "a_").withColumn("a___bucket",
      explode(array(bucket("a_") - 1, bucket("a_"), bucket("a_") + 1)))
    val bb = prep(b, "b_").withColumn("b___bucket", bucket("b_"))
    val aS = s"a_$startCol"; val aE = s"a_$endCol"
    val bS = s"b_$startCol"; val bE = s"b_$endCol"
    aa.join(bb, col("a___bucket") === col("b___bucket") && expr(
        // state-bounding range on the two EVENT-TIME columns, implied
        // by overlap + bounded length…
        s"$bS >= $aS - INTERVAL $maxLenSec SECONDS AND " +
          s"$bS <= $aS + INTERVAL $maxLenSec SECONDS AND " +
          // …then the exact overlap predicate on candidates only
          s"$aS <= $bE AND $bS <= $aE"))
      .drop("a___bucket", "b___bucket")
      .withColumn("overlap_us",
        least(expr(s"unix_micros($aE)"), expr(s"unix_micros($bE)")) -
          greatest(expr(s"unix_micros($aS)"), expr(s"unix_micros($bS)")))
  }
}
