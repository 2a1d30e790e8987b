package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML entity decode: the general form of
  * [[graft.ops.Html]]'s six-entity replace chain, as one codegen'd
  * scan.
  *
  * A replace CHAIN can only ever support a fixed entity list (one
  * regexp pass per entity) and needs careful ordering (`&amp;` last)
  * to avoid double-decoding; a SCANNER decodes each entity exactly
  * once, left to right, never rescanning its own output — so
  * `&amp;lt;` is `&lt;` by construction, and numeric character
  * references (`&#169;`, `&#xA9;`, any Unicode codepoint including
  * astral planes) decode without enumerating them.
  *
  * Decodes: the five XML predefined entities (`amp lt gt quot apos`),
  * `nbsp` (to a plain space — parity with the chain), and decimal/hex
  * numeric references. Anything else — unknown names, out-of-range or
  * surrogate codepoints, a bare `&` — is left verbatim: hostile input
  * degrades to itself, never errors.
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    HtmlEntityDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntityDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlEntityDecode =
    copy(child = newChild)
}

object HtmlEntityDecode {

  /** Longest supported reference body between `&` and `;`:
    * `#x10FFFF` (8 chars) / `#1114111` — cap lookahead so a stray `&`
    * never scans far.
    */
  private val MaxBody = 8

  /** Static entry shared by interpreted eval and codegen. */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val ch = str.charAt(i)
      if (ch != '&') { sb.append(ch); i += 1 }
      else {
        val semi = str.indexOf(';', i + 1)
        val body =
          if (semi < 0 || semi - i - 1 > MaxBody) null
          else decodeBody(str.substring(i + 1, semi))
        if (body == null) { sb.append(ch); i += 1 }
        else { sb.append(body); i = semi + 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** The reference body (between `&` and `;`) -> decoded string, or
    * null to keep the source verbatim.
    */
  private def decodeBody(body: String): String = body match {
    case "amp" => "&"
    case "lt" => "<"
    case "gt" => ">"
    case "quot" => "\""
    case "apos" => "'"
    case "nbsp" => " "
    case _ if body.length > 1 && body.charAt(0) == '#' =>
      try {
        val cp =
          if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
            Integer.parseInt(body.substring(2), 16)
          else Integer.parseInt(body.substring(1))
        if (cp < 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) null
        else new String(Character.toChars(cp))
      } catch { case _: NumberFormatException => null }
    case _ => null
  }

  /** Column API: decode HTML character references in `c`. */
  def decodeEntities(c: Column): Column =
    ColumnBridge.column(HtmlEntityDecode(ColumnBridge.expression(c)))
}
