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
  * ON BY DEFAULT (disable with `spark.graft.nativeVectorRewrite=false`)
  * because the substitution is guarded row by row. The natives treat
  * inputs as dense (truncate to the shorter length, never see element
  * nulls); the HOF fold returns NULL on every other row — ragged lengths
  * (zip_with pads the shorter side and null propagates through the fold),
  * null elements (the product nulls, then the fold), and null input arrays.
  * So the exact rewrite is
  *
  *   If(size(a) = size(b) [ AND no-null-elements ], native, NULL)
  *
  * — equal-length dense rows take the codegen'd fast path and every row
  * the guard rejects gets the NULL the fold would have produced (a null
  * input array nulls the size equality, and If routes a null predicate to
  * the else branch). The null-element scan is skipped when the schema
  * already proves `containsNull = false`. The guard re-evaluates size/nulls
  * over `a`/`b`; on the attribute references these folds take in practice
  * that is one cheap extra pass with no allocation.
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

  /** exists(e, x -> isnull(x)) — the runtime null-element scan for arrays
    * whose schema cannot prove density. The predicate never returns null,
    * so three-valued-logic mode is irrelevant. */
  private def hasNullElement(e: Expression): Expression = {
    val elem = e.dataType.asInstanceOf[ArrayType].elementType
    val v = NamedLambdaVariable("x", elem, nullable = true)
    ArrayExists(e, LambdaFunction(IsNull(v), Seq(v)))
  }

  /** The guarded substitution: native on rows where it is provably equal
    * to the fold, NULL (= what the fold returns) everywhere else. */
  private def guarded(a: Expression, b: Expression,
      native: Expression): Expression = {
    def dense(e: Expression) = e.dataType match {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    }
    val sizeEq = EqualTo(Size(a, legacySizeOfNull = false),
      Size(b, legacySizeOfNull = false))
    val cond =
      if (dense(a) && dense(b)) sizeEq
      else And(sizeEq, Not(Or(hasNullElement(a), hasNullElement(b))))
    If(cond, native, Literal.create(null, native.dataType))
  }

  /** The guard duplicates a/b into Size/ArrayExists alongside the native,
    * so both children must be DETERMINISTIC: a non-deterministic child
    * (e.g. shuffle(arr)) would make the guard inspect a DIFFERENT array
    * than the native computes over — the null-element check could pass
    * while the native sees a null (r10 advice). Deterministic non-attribute
    * children merely re-evaluate (up to 3x per row on the guard path),
    * which is a cost question, not a correctness one — and these folds take
    * attribute references in practice. */
  private def rewritable(a: Expression, b: Expression): Boolean =
    a.deterministic && b.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else plan.transformAllExpressions {
      // float dot in double: aggregate(zip_with(a, b, (x,y) =>
      //   x.cast(double) * y.cast(double)), 0.0, _+_)
      case HofFold(a, b, Multiply(mx, my, _), Literal(0.0, DoubleType), x, y)
          if isFloatArr(a) && isFloatArr(b) && rewritable(a, b) &&
            ((isDoubleCastOf(mx, x) && isDoubleCastOf(my, y)) ||
              (isDoubleCastOf(mx, y) && isDoubleCastOf(my, x))) =>
        guarded(a, b, DotProduct(a, b))
      // exact long dot: aggregate(zip_with(a, b, (x,y) => x*y), 0L, _+_)
      case HofFold(a, b, Multiply(mx, my, _), Literal(0L, LongType), x, y)
          if isLongArr(a) && isLongArr(b) && rewritable(a, b) &&
            ((isVar(mx, x) && isVar(my, y)) ||
              (isVar(mx, y) && isVar(my, x))) =>
        guarded(a, b, DotProductLong(a, b))
      // exact squared distance: aggregate(zip_with(a, b, (x,y) =>
      //   (x-y)*(x-y)), 0L, _+_)
      case HofFold(a, b,
            Multiply(Subtract(s1l, s1r, _), Subtract(s2l, s2r, _), _),
            Literal(0L, LongType), x, y)
          if isLongArr(a) && isLongArr(b) && rewritable(a, b) &&
            isVar(s1l, x) && isVar(s1r, y) &&
            isVar(s2l, x) && isVar(s2r, y) =>
        guarded(a, b, SquaredDistanceLong(a, b))
    }
}
