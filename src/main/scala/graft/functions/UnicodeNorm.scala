package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the
  * pre-tokenization step every real text pipeline needs and Spark SQL
  * lacks: the SAME user-visible text arrives in different byte forms
  * (`é` precomposed U+00E9 vs `e`+combining U+0301), so every
  * downstream exact operation — dedup fingerprints, shingle Jaccard,
  * group-by-token, contamination n-grams — silently treats equal
  * strings as distinct unless the corpus is normalized first.
  *
  * `form` is the `java.text.Normalizer.Form` name (NFC/NFD/NFKC/NFKD
  * — a VALIDATED literal, not a free string). The fast path costs one
  * scan: `Normalizer.isNormalized` is true for overwhelmingly-ASCII
  * corpora and skips allocation entirely; only strings that actually
  * need work pay for normalization. Accent stripping composes from
  * this plus built-ins (NFD + `\p{M}` removal — see
  * [[graft.ops.TextNormalize]]), deliberately NOT a second custom
  * expression.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  UnicodeNormalize.formOf(form) // validate at construction, fail at plan time

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  private[functions] def formOf(form: String): java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  /** Static entry shared by interpreted eval and codegen. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = formOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column API: normalize `c` to the given Unicode form. */
  def normalized(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
