package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  *
  * over `array<float>` columns into the native codegen'd [[DotProd]].
  *
  * Why a Rule and not just the `vec_dot` function: users (and portable SQL)
  * write the HOF form because it runs on any Spark; interpreted lambdas
  * cost ~µs/row·element and break whole-stage codegen.
  *
  * Semantics preservation, strictly: the rewrite fires ONLY when both
  * element types are provably non-null (`containsNull = false` — with
  * nullable elements the HOF yields NULL for a null SLOT, which a static
  * rewrite cannot distinguish from data). `DotProd` itself returns NULL
  * on unequal lengths, matching `zip_with`'s null-padding, and its
  * index-order double accumulation is bit-identical to the interpreted
  * form (pinned in VecRewriteSpec). Embedding pipelines should declare
  * non-null array elements in their schemas to unlock the rewrite.
  *
  * Installed via [[GraftExtensions]] (`spark.sql.extensions`) for new
  * sessions, or [[VecRewriteInstall.install]]
  * (`experimental.extraOptimizations`) on a live one.
  */
object VecRewrite extends Rule[LogicalPlan] {

  /** `array<float>` expression with non-null elements, possibly behind the
    * `cast(array<double>)` the HOF form needs for double math.
    */
  private object FloatArray {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if isFloatArray(c.child) && isDoubleArray(c) => Some(c.child)
      case _ if isFloatArray(e) => Some(e)
      case _ => None
    }
    private def isFloatArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, containsNull) => !containsNull
      case _ => false
    }
    private def isDoubleArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
  }

  /** λ(x, y) → x * y (either argument order). */
  private def isMultiplyLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      Set(a.exprId, b.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  /** λ(acc, v) → acc + v (either order). */
  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      Set(a.exprId, b.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  /** λ(v) → v (ArrayAggregate's default finish). */
  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(x: NamedLambdaVariable), _) =>
      v.exprId == x.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(FloatArray(a), FloatArray(b), mult), zero, merge, finish)
          if zero.foldable && zero.eval() == 0.0 && zero.dataType == DoubleType &&
            isMultiplyLambda(mult) && isAddLambda(merge) && isIdentityLambda(finish) =>
        // DotProd itself yields NULL on unequal lengths, matching
        // zip_with's null-padding semantics
        DotProd(a, b)
    }
}

/** Install on a live session (the extensions hook only applies to sessions
  * built with `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object VecRewriteInstall {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(VecRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecRewrite
}
