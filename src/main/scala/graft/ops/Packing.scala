package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end into a token stream and
  * chunk the stream into fixed-size training blocks — the
  * concat-then-chunk step that turns a cleaned corpus into
  * fixed-length LM training sequences. Each document is assigned the
  * block where its token stream BEGINS plus its offset inside that
  * block; a downstream reader materializes block b by taking every
  * doc with start_block ≤ b whose span [offset, offset+len) crosses
  * the block.
  *
  * Scale shape: packing is per-GROUP (shard/language/source), never
  * global — a single global ordering would serialize the entire
  * corpus through one partition. One shuffle on the group key, then
  * an ordered running sum inside each group. Group granularity is
  * the parallelism: pick shard keys sized so a group's documents fit
  * one task (the same contract as any windowed computation).
  */
object Packing {

  /** Assign each row a (start_block, block_offset) within its group's
    * token stream, ordering rows by `orderCol` (deterministic — use a
    * unique key). `weightCol` is the row's token count.
    */
  def packTokenStream(df: DataFrame, groupCol: String, orderCol: String,
                      weightCol: String, blockTokens: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(weightCol)).over(w))
      .withColumn("start_block",
        expr(s"(_cum - $weightCol) DIV $blockTokens"))
      .withColumn("block_offset",
        expr(s"(_cum - $weightCol) % $blockTokens"))
      .drop("_cum")
  }
}
