package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

/** Optimizer rule: rewrite the canonical higher-order-function vector folds
  *
  *   aggregate(zip_with(a, b, (x, y) => x·y), 0, (acc, v) => acc + v)
  *
  * into the native codegen'd expressions ([[DotProduct]] /
  * [[DotProductLong]] / [[SquaredDistanceLong]]). The HOF chain is correct
  * but interpreted: every row allocates the zipped array and walks it
  * through non-codegen lambda dispatch, which is the difference between an
  * ANN scan being memory-bound and compute-bound. The natives emit one
  * static call inside whole-stage codegen and accumulate in a register.
  *
  * OPT-IN via `spark.graft.nativeVectorRewrite=true` (conf, default off):
  * on ragged arrays or null elements the HOF result is NULL (zip_with pads
  * the shorter side with nulls, and null propagates through the fold)
  * while the natives treat the input as dense and truncate to the shorter
  * length. For embedding columns — fixed-width, non-null — the two are
  * bitwise-identical (pinned by ExpressionsSpec and NativeVectorRewriteSpec);
  * the flag states that contract explicitly instead of changing query
  * semantics behind the user's back.
  *
  * Injected by [[GraftExtensions]] (`injectOptimizerRule`); also usable via
  * `spark.experimental.extraOptimizations` on an existing session.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.nativeVectorRewrite"

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** x cast to double (the float-array dot writes x.cast * y.cast). */
  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(c, DoubleType, _, _) => isVar(c, v)
      case _ => false
    }

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isLongArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** Shared scaffold: aggregate(zip_with(a, b, <prod>), <zero>, acc+v) with
    * an identity finish. Yields (a, b, product expression, zero, x, y). */
  private object HofFold {
    def unapply(e: Expression): Option[(Expression, Expression, Expression,
        Literal, NamedLambdaVariable, NamedLambdaVariable)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(prod,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero: Literal,
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(r: NamedLambdaVariable), _))
          if fin.exprId == r.exprId &&
            ((isVar(al, acc) && isVar(ar, v)) ||
              (isVar(al, v) && isVar(ar, acc))) =>
        Some((a, b, prod, zero, x, y))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "false") != "true") plan
    else plan.transformAllExpressions {
      // float dot in double: aggregate(zip_with(a, b, (x,y) =>
      //   x.cast(double) * y.cast(double)), 0.0, _+_)
      case HofFold(a, b, Multiply(mx, my, _), Literal(0.0, DoubleType), x, y)
          if isFloatArr(a) && isFloatArr(b) &&
            ((isDoubleCastOf(mx, x) && isDoubleCastOf(my, y)) ||
              (isDoubleCastOf(mx, y) && isDoubleCastOf(my, x))) =>
        DotProduct(a, b)
      // exact long dot: aggregate(zip_with(a, b, (x,y) => x*y), 0L, _+_)
      case HofFold(a, b, Multiply(mx, my, _), Literal(0L, LongType), x, y)
          if isLongArr(a) && isLongArr(b) &&
            ((isVar(mx, x) && isVar(my, y)) ||
              (isVar(mx, y) && isVar(my, x))) =>
        DotProductLong(a, b)
      // exact squared distance: aggregate(zip_with(a, b, (x,y) =>
      //   (x-y)*(x-y)), 0L, _+_)
      case HofFold(a, b,
            Multiply(Subtract(s1l, s1r, _), Subtract(s2l, s2r, _), _),
            Literal(0L, LongType), x, y)
          if isLongArr(a) && isLongArr(b) &&
            isVar(s1l, x) && isVar(s1r, y) &&
            isVar(s2l, x) && isVar(s2r, y) =>
        SquaredDistanceLong(a, b)
    }
}
