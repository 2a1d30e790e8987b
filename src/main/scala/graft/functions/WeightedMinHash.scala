package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k WEIGHTED MinHash values of a document in one pass over its
  * token array — the narrow-map analogue of [[MinHashShingles]] for
  * multiset (tf-weighted) Jaccard.
  *
  * Weighted MinHash by repetition expansion: the r-th occurrence of a
  * token contributes element (token, r), so a token with frequency w
  * contributes w distinct elements and the k-min signature estimates
  * sum(min(tf_a, tf_b)) / sum(max(tf_a, tf_b)). The composable
  * pipeline (`Dedup.weightedMinhashSignatures`) computes the same
  * estimator with a tf groupBy + sequence explode + aggregation —
  * two corpus-volume shuffles; this expression needs ZERO: occurrence
  * indices come from an open-addressed long->count table local to the
  * row, element hashes from a polynomial (tokenHash, rep) combine +
  * splitmix64 finalizer, minima from Kirsch-Mitzenmacher h1 + j*h2
  * (mod 2^32). All primitive longs; O(tokens) time, O(distinct
  * tokens) scratch per row.
  *
  * Same contract as the md5 family: identical token SEQUENCES (up to
  * reordering) get identical signatures; multiset-similar documents
  * collide per band with the standard MinHash probability. Different
  * hash family than md5 → different (equally valid) signatures; use
  * this at corpus scale, the md5 variant for cross-engine oracle
  * parity.
  */
case class WeightedMinHashTokens(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null for an empty token array (no element to hash)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WeightedMinHashTokens.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = ctx.freshName("wmh")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $result =
         |  graft.functions.WeightedMinHashTokens.compute($c, $k);
         |if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WeightedMinHashTokens =
    copy(child = newChild)
}

object WeightedMinHashTokens {

  /** Static entry shared by interpreted eval and codegen. Returns null
    * for an empty array.
    */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return null

    // open-addressed tokenHash -> occurrences-so-far table (power-of-
    // two capacity >= 2n; cnts == 0 marks an empty slot). Keying on
    // the 64-bit token hash instead of the string is deliberate: a
    // collision only relabels occurrence indices, which perturbs the
    // signature exactly like any other hash collision — deterministic
    // and astronomically rare.
    var cap = 4
    while (cap < n * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    val mask = cap - 1

    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)

    var i = 0
    while (i < n) {
      // FNV-1a 64 over the token's UTF-8 bytes, no copies
      val u = tokens.getUTF8String(i)
      var h = 0xcbf29ce484222325L
      var b = 0
      val nb = u.numBytes()
      while (b < nb) {
        h = (h ^ (u.getByte(b) & 0xffL)) * 0x100000001b3L
        b += 1
      }

      // occurrence index of this token so far (1-based)
      var idx = (h ^ (h >>> 32)).toInt & mask
      while (cnts(idx) != 0 && keys(idx) != h) idx = (idx + 1) & mask
      keys(idx) = h
      cnts(idx) += 1
      val rep = cnts(idx)

      // element hash of (token, rep): polynomial combine + splitmix64
      var hh = h * 0x9e3779b97f4a7c15L + rep
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
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API: array of the k weighted MinHash values of `tokens`. */
  def weightedMinhashArray(tokens: Column, k: Int): Column =
    ColumnBridge.column(WeightedMinHashTokens(ColumnBridge.expression(tokens), k))
}
