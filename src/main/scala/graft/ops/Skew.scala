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
