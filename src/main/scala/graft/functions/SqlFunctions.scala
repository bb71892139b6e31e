package graft.functions

import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** The graft expression library exposed to SQL (round-6 verdict item 7):
  * one shared (name → builder) list feeding BOTH registration routes —
  * [[GraftExtensions]] (`spark.sql.extensions`, session construction) and
  * [[SqlFunctions.registerAll]] (live-session registry) — so the SQL-only
  * audience of the X128 `USING graft` surface can call the native
  * expressions (`vec_cosine`, `jaro_winkler`, `url_canon`, `html_text`,
  * `nfc_normalize`, `topk_by_count`) without importing a graft class.
  *
  * Every builder resolves to the SAME codegen'd Catalyst expression the
  * Scala API uses — SQL callers lose nothing: whole-stage codegen,
  * null-safety, and the oracle-pinned semantics are identical.
  */
object SqlFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an integer literal, got $other")
  }

  /** (name, info, builder) for every SQL-exposed graft function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "vec_cosine"),
      (args: Seq[Expression]) => CosineSim(
        VectorOps.coerceFloatArray(args(0)), VectorOps.coerceFloatArray(args(1)))),
    ("vec_dot",
      new ExpressionInfo(classOf[DotProd].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProd(
        VectorOps.coerceFloatArray(args(0)), VectorOps.coerceFloatArray(args(1)))),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (args: Seq[Expression]) => JaroWinklerSim(args(0), args(1))),
    ("url_canon",
      new ExpressionInfo(classOf[UrlCanonicalize].getName, "url_canon"),
      (args: Seq[Expression]) => UrlCanonicalize(args(0))),
    ("html_text",
      new ExpressionInfo(classOf[HtmlExtractText].getName, "html_text"),
      (args: Seq[Expression]) => HtmlExtractText(args(0))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args(0))),
    ("topk_by_count",
      new ExpressionInfo(classOf[TopKByCount].getName, "topk_by_count"),
      (args: Seq[Expression]) =>
        TopKByCount(args(0), intArg(args(1), "topk_by_count"))),
  )

  /** Register every graft function on a LIVE session (idempotent — the
    * registry overwrites same-name entries with identical builders).
    */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      GraftShim.registerFunction(spark, name, info, builder)
    }
}
