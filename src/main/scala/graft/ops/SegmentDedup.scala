package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sub-document deduplication: dedup at SEGMENT granularity (fixed
  * token windows standing in for lines/paragraphs) and reassemble
  * each document from its surviving segments — the FineWeb/CCNet
  * "line-level dedup" shape, which removes boilerplate shared across
  * documents (headers, navbars, license blocks) that document-level
  * dedup can never touch.
  *
  * Keeper policy: a segment's first occurrence in (doc_id, seg_idx)
  * order survives; every later identical segment is dropped. The
  * global first-occurrence rank is one window over the segment
  * content — a single shuffle keyed by segment, whose partitions are
  * the duplicate groups themselves (tiny); reassembly is one shuffle
  * back on doc_id. Both are the minimal data movement for the
  * semantics: cross-document dedup cannot be decided row-locally.
  */
object SegmentDedup {

  /** Dedup `textCol` at `segTokens`-token segment granularity.
    * Output per input doc: n_segs, n_kept, and clean_fp = md5 of the
    * reassembled (kept segments, original order) text — null when
    * every segment was a duplicate.
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
                    segTokens: Int): DataFrame = {
    val segs = segments(df, idCol, textCol, segTokens)
    val w = Window.partitionBy("seg").orderBy(col(idCol), col("seg_idx"))
    val kept = segs
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
    reassemble(segs, kept, idCol)
  }

  /** (id, seg_idx, seg): the document split into `segTokens`-token
    * windows. Narrow (explode only — no shuffle).
    */
  def segments(df: DataFrame, idCol: String, textCol: String,
               segTokens: Int): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(col(idCol),
        posexplode(expr(
          s"""transform(sequence(0, (size(tk) - 1) DIV $segTokens),
             |  s -> concat_ws(' ', slice(tk, s * $segTokens + 1, $segTokens)))"""
            .stripMargin)).as(Seq("seg_idx", "seg")))

  /** Reassemble per-document stats from the full segment set and the
    * surviving subset: n_segs, n_kept, clean_fp = md5 of the kept
    * segments in original order (null when nothing survived).
    */
  def reassemble(segs: DataFrame, kept: DataFrame, idCol: String): DataFrame = {
    val totals = segs.groupBy(idCol).agg(count(lit(1)).as("n_segs"))
    val agg = kept.groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            x => x.getField("seg")), " ")).as("clean_fp"))
    totals.join(agg, Seq(idCol), "left")
      .select(col(idCol), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("clean_fp"))
  }
}
