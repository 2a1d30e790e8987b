package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash values of a document in ONE pass over its token
  * array — no shingle strings, no row explosion, no aggregation.
  *
  * The composable pipeline (explode shingles -> hash -> k min-aggs)
  * is what the md5 oracle path does; at corpus scale it materializes
  * |tokens| shingle strings per document and shuffles a 26M-row
  * explode through a HashAggregate (the round-1 q45 plan). This
  * expression turns the whole signature computation into a NARROW MAP:
  * per token one FNV-1a hash, per shingle a rolling polynomial combine
  * + splitmix finalizer, per hash family j the Kirsch-Mitzenmacher
  * h1 + j*h2 (mod 2^32) minimum — all in primitive longs, zero
  * allocation per shingle.
  *
  * Same contract as the md5 family: exact duplicate token arrays get
  * identical signatures; Jaccard-similar shingle sets collide per
  * band with the standard MinHash probability.
  */
case class MinHashShingles(child: Expression, k: Int, width: Int)
    extends UnaryExpression {

  require(k > 0 && width > 0, "k and width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null when the document has fewer than `width` tokens (no shingle)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashShingles.compute(input.asInstanceOf[ArrayData], k, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = ctx.freshName("mh")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $result =
         |  graft.functions.MinHashShingles.compute($c, $k, $width);
         |if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
}

object MinHashShingles {

  /** Static entry shared by interpreted eval and codegen. Returns null
    * when fewer than `width` tokens exist.
    */
  def compute(tokens: ArrayData, k: Int, width: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < width) return null

    // one FNV-1a 64 per token (over its UTF-8 bytes, no copies)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = tokens.getUTF8String(i)
      var h = 0xcbf29ce484222325L
      var b = 0
      val nb = u.numBytes()
      while (b < nb) {
        h = (h ^ (u.getByte(b) & 0xffL)) * 0x100000001b3L
        b += 1
      }
      th(i) = h
      i += 1
    }

    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    val last = n - width
    while (s <= last) {
      // rolling polynomial combine over the window, then a splitmix64
      // finalizer so shingle hashes decorrelate
      var hh = 0L
      var w = 0
      while (w < width) {
        hh = hh * 0x9e3779b97f4a7c15L + th(s + w)
        w += 1
      }
      hh ^= (hh >>> 30); hh *= 0xbf58476d1ce4e5b9L
      hh ^= (hh >>> 27); hh *= 0x94d049bb133111ebL
      hh ^= (hh >>> 31)
      val h1 = hh & 0xffffffffL
      val h2 = hh >>> 32
      var j = 0
      while (j < k) {
        val v = (h1 + j * h2) & 0xffffffffL
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API: array of the k MinHash values of `tokens`. */
  def minhashArray(tokens: Column, k: Int, width: Int): Column =
    ColumnBridge.column(MinHashShingles(ColumnBridge.expression(tokens), k, width))
}
