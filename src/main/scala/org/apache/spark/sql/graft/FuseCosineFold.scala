package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

/** OPTIMIZER RULE tier (the last Catalyst extension surface after the
  * scalar expressions, the UDAF, the whole-operator plan node and the
  * DataSourceV2 connector): rewrites the composable-built-ins cosine
  * (graft.llm.Similarity.cosineFold — `round(aggregate(zip_with(a, b,
  * (x,y) -> dbl(x)*dbl(y)), 0.0, +) / (sqrt(Σx²)·sqrt(Σy²)), 6)`) into
  * the fused single-pass native [[CosineSimilarity]] kernel, so a user
  * who writes the textbook higher-order-function form — from SQL text or
  * the Column API, without knowing the native function exists — gets the
  * one-vector-walk codegen kernel anyway (three array traversals with
  * six lambda invocations per element become one loop).
  *
  * Safety is structural, not asserted: the rewrite fires only on the
  * EXACT fold shape over `ARRAY<FLOAT>` inputs (the native kernel's
  * element type; the classifier's ARRAY<DOUBLE> prototype folds are
  * excluded by the type guard), lambda variables are matched by exprId
  * so an accumulator swap or a cross-wired zip cannot match, and
  * [[CosineSimilarity]] is already spec-pinned bit-identical to the fold
  * (same index-sequential accumulation — CosineExpressionSpec), so the
  * rewrite can never change one output bit. Registered by
  * [[GraftExtensions]] via `injectOptimizerRule` at session build, and
  * by [[GraftExtensions.register]] through `experimental
  * .extraOptimizations` for already-built sessions (the driver-contract
  * path); FuseCosineFoldSpec pins the fired plan, the type-guard
  * negative, and value equality on corpus data. */
object FuseCosineFold extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  /** `(acc, v) -> acc + v` with the lambda's own variables, in order. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      l.exprId == a.exprId && r.exprId == b.exprId
    case _ => false
  }

  /** `x -> x` (the default finish lambda of `aggregate`). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  /** `aggregate(arg, 0.0, (x,y) -> x+y, x -> x)` → the fold argument. */
  private def sumFoldArg(e: Expression): Option[Expression] = e match {
    case ArrayAggregate(arg, zero, merge, finish)
        if isZero(zero) && isSumMerge(merge) && isIdentity(finish) => Some(arg)
    case _ => None
  }

  private def isFloatArray(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  /** `zip_with(a, b, (x, y) -> double(x) * double(y))` → (a, b). */
  private def dotArrays(e: Expression): Option[(Expression, Expression)] = e match {
    case ZipWith(a, b, LambdaFunction(
        Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
          Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(ax: NamedLambdaVariable, by: NamedLambdaVariable), _))
        if x.exprId == ax.exprId && y.exprId == by.exprId => Some((a, b))
    case _ => None
  }

  /** `sqrt(aggregate(transform(arr, x -> double(x)*double(x)), 0.0, +))`
    * → arr. */
  private def normArray(e: Expression): Option[Expression] = e match {
    case Sqrt(agg) => sumFoldArg(agg).flatMap {
      case ArrayTransform(arr, LambdaFunction(
          Multiply(Cast(x1: NamedLambdaVariable, DoubleType, _, _),
            Cast(x2: NamedLambdaVariable, DoubleType, _, _), _),
          Seq(ax: NamedLambdaVariable), _))
          if x1.exprId == ax.exprId && x2.exprId == ax.exprId => Some(arr)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // the Round survives the rewrite: the native kernel emits the
      // UNROUNDED cosine (its callers apply round(·, 6), exactly like
      // the fold's shape here), so fused = round(CosineSimilarity, 6)
      case r @ Round(Divide(dotAgg, Multiply(nl, nr, _), _), Literal(6, IntegerType), _)
          if (for {
            arg <- sumFoldArg(dotAgg)
            ab <- dotArrays(arg)
            na <- normArray(nl)
            nb <- normArray(nr)
          } yield ab._1.semanticEquals(na) && ab._2.semanticEquals(nb) &&
            isFloatArray(ab._1) && isFloatArray(ab._2)).contains(true) =>
        val (a, b) = dotArrays(sumFoldArg(dotAgg).get).get
        r.withNewChildren(Seq(CosineSimilarity(a, b), r.scale))
    }
}
