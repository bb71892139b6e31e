package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as a native Catalyst expression (extension X146).
  *
  * Web-crawl corpora key their exact-dedup and visited-set logic on a
  * CANONICAL url: the same page arrives as `HTTP://Example.COM:80/a/`,
  * `http://example.com/a?utm=…#frag`, and a dozen other spellings, and a
  * byte-keyed dedup treats them as distinct documents (C4/CommonCrawl
  * hygiene). The rules here are the conservative, lossless-intent core
  * every crawler agrees on:
  *
  *   1. drop the fragment (`#…` — client-side only, never reaches the
  *      server);
  *   2. lowercase the scheme and authority (DNS is case-insensitive; the
  *      path is NOT touched — it is case-sensitive on most servers);
  *   3. strip the scheme's default port (`:80` http, `:443` https);
  *   4. strip trailing slashes from the path;
  *   5. sort query parameters byte-lexicographically (servers treat the
  *      query as an unordered bag; crawlers emit either order).
  *
  * A string without `://` passes through untouched (minus fragment) —
  * canonicalization is idempotent and never invents structure.
  *
  * Same (b)-tier shape as [[TextNorm]]: a `UnaryExpression` whose
  * generated code is one static call, staying inside the codegen'd
  * stage — no UDF boxing on what is a per-row hot path over the whole
  * corpus.
  */
object UrlCanon {

  def canon(u: UTF8String): UTF8String = {
    val raw0 = u.toString.trim
    val hashIdx = raw0.indexOf('#')
    val raw = if (hashIdx >= 0) raw0.substring(0, hashIdx) else raw0
    val sep = raw.indexOf("://")
    if (sep < 0) return UTF8String.fromString(raw)
    val scheme = raw.substring(0, sep).toLowerCase
    val rest = raw.substring(sep + 3)
    val slash = rest.indexOf('/')
    val qm = rest.indexOf('?')
    val authEnd =
      if (slash < 0 && qm < 0) rest.length
      else if (slash < 0) qm
      else if (qm < 0) slash
      else math.min(slash, qm)
    var auth = rest.substring(0, authEnd).toLowerCase
    val defPort =
      if (scheme == "http") ":80" else if (scheme == "https") ":443" else null
    if (defPort != null && auth.endsWith(defPort))
      auth = auth.substring(0, auth.length - defPort.length)
    val tail = rest.substring(authEnd)
    val qIdx = tail.indexOf('?')
    var path = if (qIdx >= 0) tail.substring(0, qIdx) else tail
    val query = if (qIdx >= 0) tail.substring(qIdx + 1) else null
    while (path.endsWith("/")) path = path.substring(0, path.length - 1)
    val sortedQ =
      if (query == null) ""
      else {
        val ps = query.split("&").filter(_.nonEmpty)
        if (ps.isEmpty) "" else "?" + ps.sorted.mkString("&")
      }
    UTF8String.fromString(scheme + "://" + auth + path + sortedQ)
  }

  /** `url_canon(string) -> string` Column builder. */
  def url_canon(c: Column): Column =
    GraftShim.column(UrlCanonicalize(GraftShim.expression(c)))
}

case class UrlCanonicalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "url_canon"

  override protected def nullSafeEval(input: Any): Any =
    UrlCanon.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
