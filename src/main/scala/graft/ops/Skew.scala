package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling salted join.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is
  * the explicit fallback when one join key dominates (a single hot
  * key exceeds what one task can hold). The big side gets a
  * deterministic salt derived from a caller-chosen discriminator
  * column (NOT rand() — reproducibility survives retries and
  * speculative execution); the small side is replicated `saltFactor`
  * ways. Join fans the hot key across `saltFactor` tasks.
  *
  * When to use (measured: BenchScale `skew_hotkey_*` rows, half of a
  * 12M-row fact on ONE key against a 3M-row non-broadcastable dim):
  * reach for salting when (a) AQE is unavailable or its skew split
  * doesn't apply — the skewed side feeds an AGGREGATION or window on
  * the same key (aggregation partitions can't be split), or the
  * planner picked a broadcast/nested-loop shape AQE won't rewrite —
  * or (b) the hot key is known AHEAD of time and you want the fan-out
  * pinned (deterministic task sizing) rather than discovered at
  * runtime. Under plain AQE-managed sort-merge joins, prefer doing
  * nothing: the split is free and adaptive. `saltFactor` ~ the number
  * of tasks one hot key should spread over (cores for one dominant
  * key); the small side pays a `saltFactor`x replication, so keep it
  * bounded by hot-key-rows / healthy-task-rows. Correctness is
  * oracle-gated equal to the plain join (q167).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `saltFactor` ways.
    * `discriminator` spreads the big side's hot-key rows (any column
    * with per-row variety, e.g. a line number or row id).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 discriminator: Column, saltFactor: Int): DataFrame = {
    val bigS = big.withColumn("_salt", pmod(xxhash64(discriminator), lit(saltFactor)))
    val smallS = small
      .withColumn("_salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
      .withColumn("_salt", col("_salt").cast("long"))
    bigS.join(smallS,
        bigS("_salt") === smallS("_salt") && bigS(key) === smallS(key))
      .drop("_salt")
      .drop(smallS(key))
  }
}
