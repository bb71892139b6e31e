package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** X152 pins: the extractor's hostile-input behavior beyond the oracled
  * q_html_extract — script/style/comment content drops whole, entity
  * decode is exact and conservative, malformed markup degrades instead
  * of throwing, and the expression stays inside whole-stage codegen.
  */
class HtmlTextSpec extends SparkSpec {

  private def x(s: String): String =
    HtmlText.extract(UTF8String.fromString(s)).toString

  test("tags strip, content keeps, whitespace collapses") {
    assert(x("<p>Hello   <b>world</b></p>") == "Hello world")
    assert(x("  <div>\n\ta\n</div>  <span>b</span>") == "a b")
    assert(x("plain text, no markup") == "plain text, no markup")
  }

  test("script and style bodies drop entirely — even with '<' and fake close tags inside") {
    assert(x("""a<script>if(i<10){s="</div>";}</script>b""") == "a b")
    assert(x("""a<SCRIPT type="x">y</SCRIPT>b""") == "a b") // case-insensitive
    assert(x("a<style>p>span{x:1}</style>b") == "a b")
    assert(x("a<script>never closed") == "a") // malformed: tail drops, no throw
  }

  test("comments drop with their content, including tags inside") {
    assert(x("a<!-- <b>not text</b> -->b") == "a b")
    assert(x("a<!-- unterminated") == "a")
  }

  test("entities: the known set decodes, bare ampersands pass through") {
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos; f&nbsp;g") ==
      "a & b <c> \"d\" 'e' f g")
    assert(x("x &#65;&#x42; y") == "x AB y") // numeric + hex references
    assert(x("Tom & Jerry &unknown; &") == "Tom & Jerry &unknown; &")
  }

  test("attributes vanish with the tag — & and quotes inside never leak") {
    assert(x("""<a href="/p?a=1&b=2" title="x<y">link</a>""") == "link")
  }

  test("the expression stays inside whole-stage codegen") {
    val df = spark.range(3).select(HtmlText.html_text(
      concat(lit("<p>t"), col("id").cast("string"), lit("</p>"))).as("t"))
    assert(df.collect().map(_.getString(0)).sorted.head == "t0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }
}
