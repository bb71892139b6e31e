package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction as a native expression (extension X152) — the
  * step between the WARC front door (X147/X150) and every text-analysis
  * operator: crawled payloads are markup, the corpus wants prose (what
  * CommonCrawl's WET generation and trafilatura-class extractors do at
  * industrial scale).
  *
  * One single-pass state machine, deliberately conservative:
  *
  *   - `<script>`/`<style>` elements drop WITH their content (code and
  *     CSS are not prose; their bodies may contain `<`, quotes, anything
  *     — the scanner hunts the matching close tag case-insensitively);
  *   - comments `<!-- … -->` drop with their content;
  *   - every other tag drops but CONTRIBUTES A SEPARATOR (block vs
  *     inline distinctions don't survive whitespace collapse anyway);
  *     attributes vanish with the tag, including `&`/`<` inside quoted
  *     attribute values;
  *   - the five XML entities + `&nbsp;` + decimal/hex numeric character
  *     references decode; an unrecognized `&…` run passes through
  *     verbatim (crawled HTML is full of bare ampersands — eating them
  *     corrupts text);
  *   - whitespace runs (input whitespace + tag separators) collapse to
  *     single spaces, ends trimmed — the same normalization the text
  *     tiers apply, so extraction output feeds them byte-stably.
  *
  * Same (b)-tier shape as [[TextNorm]]/[[UrlCanon]]: a `UnaryExpression`
  * whose generated code is one static call — per-row work inside the
  * codegen'd stage, no UDF boxing, no shuffle contributed. A malformed
  * payload (unclosed tag/script) degrades to dropping the tail, never
  * throws: crawl data is hostile, extraction must be total.
  */
object HtmlText {

  private def lowerAt(s: String, i: Int): Char = {
    val c = s.charAt(i)
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  private def matchesAt(s: String, i: Int, word: String): Boolean = {
    if (i + word.length > s.length) return false
    var k = 0
    while (k < word.length) {
      if (lowerAt(s, i + k) != word.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Index just past the case-insensitive `</name…>` close tag at or
    * after `from`, or the string end when unclosed.
    */
  private def skipElement(s: String, from: Int, name: String): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' && i + 1 < s.length && s.charAt(i + 1) == '/' &&
        matchesAt(s, i + 2, name)) {
        var j = i + 2 + name.length
        while (j < s.length && s.charAt(j) != '>') j += 1
        return if (j < s.length) j + 1 else s.length
      }
      i += 1
    }
    s.length
  }

  def extract(u: UTF8String): UTF8String = {
    val s = u.toString
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0

    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (out.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
    }

    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        if (matchesAt(s, i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) s.length else e + 3
        } else if (matchesAt(s, i + 1, "script")) {
          i = skipElement(s, i + 1, "script")
        } else if (matchesAt(s, i + 1, "style")) {
          i = skipElement(s, i + 1, "style")
        } else {
          var j = i + 1
          while (j < s.length && s.charAt(j) != '>') j += 1
          i = if (j < s.length) j + 1 else s.length
        }
        if (out.length > 0) pendingSpace = true // tags separate words
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi > i && semi <= i + 10) s.substring(i + 1, semi) else null
        val decoded: String = body match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" | "#39" => "'"
          case "nbsp" => " "
          case b if b != null && b.length > 1 && b.charAt(0) == '#' =>
            try {
              val cp = if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
                Integer.parseInt(b.substring(2), 16)
              else Integer.parseInt(b.substring(1))
              if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
              else null
            } catch { case _: NumberFormatException => null }
          case _ => null
        }
        if (decoded != null) { decoded.foreach(emit); i = semi + 1 }
        else { emit('&'); i += 1 } // bare ampersand: pass through
      } else {
        emit(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** `html_text(string) -> string` Column builder. */
  def html_text(c: Column): Column =
    GraftShim.column(HtmlExtractText(GraftShim.expression(c)))
}

case class HtmlExtractText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "html_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
