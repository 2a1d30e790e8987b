package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SQL-surface twin of [[TopKAgg]]: the same bounded top-k-per-group
  * aggregate (key desc, id asc — a total order, <= k entries ever
  * cross the shuffle) as a `TypedImperativeAggregate`, so
  * `topk_agg(key, id, k)` is callable from `spark.sql` with a
  * per-call k — an `Aggregator` registered as a UDAF would freeze k
  * at registration. The ordering/merge logic is DELEGATED to
  * [[TopKAgg]] (one implementation, two bindings); only the
  * buffer serialization (16 bytes/pair) and the Catalyst plumbing
  * live here. Output: array<struct<key:bigint, id:bigint>> sorted by
  * the group order, equal to the window row_number form
  * (`SqlSurfaceSpec` pins it).
  */
final case class TopKPairsAgg(
    keyChild: Expression, idChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Vector[(Long, Long)]] {

  require(k >= 1, s"k must be >= 1 (got $k)")
  private val logic = TopKAgg(k)

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyChild.dataType == LongType && idChild.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_agg requires (BIGINT key, BIGINT id); got" +
        s" (${keyChild.dataType}, ${idChild.dataType})")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def children: Seq[Expression] = Seq(keyChild, idChild)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(keyChild = newChildren(0), idChild = newChildren(1))

  override def createAggregationBuffer(): Vector[(Long, Long)] = logic.zero

  override def update(buffer: Vector[(Long, Long)],
                      input: InternalRow): Vector[(Long, Long)] = {
    val kv = keyChild.eval(input)
    val iv = idChild.eval(input)
    if (kv == null || iv == null) buffer // null rows never rank
    else logic.reduce(buffer, (kv.asInstanceOf[Long], iv.asInstanceOf[Long]))
  }

  override def merge(a: Vector[(Long, Long)],
                     b: Vector[(Long, Long)]): Vector[(Long, Long)] =
    logic.merge(a, b)

  override def eval(buffer: Vector[(Long, Long)]): Any =
    new GenericArrayData(buffer.map(p => InternalRow(p._1, p._2)).toArray)

  override def serialize(buffer: Vector[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.size * 16)
    buffer.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Vector[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    Vector.fill(bytes.length / 16)((bb.getLong(), bb.getLong()))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
}
