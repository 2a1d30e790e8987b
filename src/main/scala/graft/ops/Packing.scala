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

  /** Sliding-window document chunking: split each document's token
    * stream into overlapping windows of `size` tokens advancing by
    * `stride` (< size ⇒ size−stride tokens of context overlap) — the
    * retrieval/embedding chunking shape ([[packTokenStream]] packs
    * for TRAINING; this chunks for INDEXING, where a hit must carry
    * enough context to stand alone). Chunk count per doc is
    * 1 + ceil(max(n − size, 0) / stride), so every token is covered
    * and the final window may run short.
    *
    * Pure in-row frame algebra: tokenize → `sequence`/`transform`/
    * `slice`/`inline`, all codegen'd, ZERO shuffles and no UDF — each
    * document expands to its chunks inside its own task, so the op
    * scales with the corpus scan. Provenance (chunk_idx, start_tok,
    * n_tok_chunk) rides every chunk row for lossless reassembly.
    *
    * `tokenExpr` is the SQL expression producing the token array
    * (callers pass the corpus-standard tokenizer so chunk boundaries
    * agree with every other token-addressed op).
    */
  def chunkTokens(df: DataFrame, idCol: String, tokenExpr: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    df.select(col(idCol), expr(tokenExpr).as("_tk"))
      .withColumn("_n", expr("size(_tk)")) // fn shadowed by the param
      .withColumn("_nchunks",
        expr(s"IF(_n <= $size, 1, 1 + (_n - $size + $stride - 1) DIV $stride)"))
      .select(col(idCol), expr(
        s"""inline(transform(sequence(0, _nchunks - 1),
           |  k -> struct(
           |    CAST(k AS INT) AS chunk_idx,
           |    CAST(k * $stride AS INT) AS start_tok,
           |    CAST(least($size, _n - k * $stride) AS INT) AS n_tok_chunk,
           |    concat_ws(' ', slice(_tk, k * $stride + 1, $size)) AS chunk_text)))"""
          .stripMargin))
  }
}
