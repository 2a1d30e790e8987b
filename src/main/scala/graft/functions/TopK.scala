package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k per group as a MERGEABLE aggregate — the scale
  * alternative to the `row_number() OVER (PARTITION BY g ORDER BY v)
  * <= k` window idiom.
  *
  * Why this exists: the window form shuffles EVERY row of the input
  * to its group's partition and sorts the full partition, then throws
  * away all but k rows — at 100 TB that is a full-data exchange plus
  * an O(n log n) sort per group to keep a handful of winners. An
  * aggregator with a bounded buffer does the same job as a standard
  * partial/final aggregation: each map task keeps at most k
  * candidates per group it sees (reduce), the shuffle moves only
  * those <= k-row summaries, and merge folds summaries
  * associatively. Data movement drops from O(rows) to
  * O(groups x k x map-partitions) — the same partial-aggregation
  * shape that makes `sum` scale.
  *
  * MEASURED caveat (BenchScale topk/window shuffle_mb rows): the
  * reduction factor is k / (rows per group per map partition). With
  * sparse groups (that ratio near or below k) the partial barely
  * drops rows and its serialized buffers compress WORSE than the
  * window's raw columnar shuffle — the window form moves fewer bytes
  * there. Prefer this aggregator for dense groups (few groups or few
  * wide partitions); prefer the window when groups ≈ rows.
  *
  * Semantics: top k by `key` DESCENDING, ties broken by `id`
  * ASCENDING — a total order, so the result is deterministic under
  * any partitioning and exactly equals the window form with the same
  * ORDER BY. The buffer is a sorted vector of at most k entries;
  * reduce is an O(k) insertion (with an early reject against the
  * current worst), merge is a linear merge of two sorted summaries.
  * Spark runs `Aggregator` via ObjectHashAggregate, holding the
  * buffer as a live object per group and serializing only across the
  * shuffle boundary.
  */
final case class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Vector[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1 (got $k)")

  // total order: key desc, id asc
  @inline private def before(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Vector[(Long, Long)] = Vector.empty

  override def reduce(buf: Vector[(Long, Long)],
                      in: (Long, Long)): Vector[(Long, Long)] =
    if (buf.size >= k && !before(in, buf.last)) buf // early reject vs worst
    else {
      val i = buf.indexWhere(e => before(in, e)) match {
        case -1 => buf.size
        case j => j
      }
      val grown = (buf.take(i) :+ in) ++ buf.drop(i)
      if (grown.size > k) grown.dropRight(1) else grown
    }

  override def merge(a: Vector[(Long, Long)],
                     b: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    // linear merge of two sorted summaries, truncated at k
    val out = Vector.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && before(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Vector[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Vector[(Long, Long)]] =
    ExpressionEncoder[Vector[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
