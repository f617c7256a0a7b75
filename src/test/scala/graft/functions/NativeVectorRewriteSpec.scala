package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.functions._

/** The opt-in optimizer rule that swaps interpreted HOF vector folds for the
  * native codegen'd expressions. */
class NativeVectorRewriteSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def hofDotDouble(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def hofDotLong(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private def hofSqDistLong(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ NativeVectorRewrite
    spark.conf.set(NativeVectorRewrite.ConfKey, "true")
    try body
    finally {
      spark.conf.unset(NativeVectorRewrite.ConfKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  // range-based (non-foldable) sources: a LocalRelation would be
  // constant-folded away before the rule could be observed
  private def floatVecs = {
    import spark.implicits._
    spark.range(40).select(
      transform(sequence(lit(1), lit(16)),
        i => ((i * 7 + $"id") % 23 - 11).cast("float")).as("a"),
      transform(sequence(lit(1), lit(16)),
        i => ((i * 13 + $"id" * 3) % 19 - 9).cast("float")).as("b"))
  }

  private def longVecs = {
    import spark.implicits._
    spark.range(40).select(
      transform(sequence(lit(1), lit(16)),
        i => ((i * 7 + $"id") % 23 - 11).cast("long")).as("a"),
      transform(sequence(lit(1), lit(16)),
        i => ((i * 13 + $"id" * 3) % 19 - 9).cast("long")).as("b"))
  }

  test("rewrites the float HOF dot to the native expression, results bitwise-equal") {
    import spark.implicits._
    // build fresh frames on each side: QueryExecution memoizes its
    // optimized plan, so one DataFrame cannot be observed both ways
    def q() = floatVecs.select(hofDotDouble($"a", $"b").as("d"))
    val plain = q().collect().map(_.getDouble(0)).toSeq
    withRule {
      val rewritten = q()
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("dotproduct"), s"rule did not fire:\n$opt")
      assert(!opt.contains("aggregate(zip_with"), s"HOF fold survived:\n$opt")
      assert(rewritten.collect().map(_.getDouble(0)).toSeq == plain)
    }
  }

  test("rewrites the long HOF dot and squared distance, exact results") {
    import spark.implicits._
    def q() = longVecs.select(hofDotLong($"a", $"b").as("d"),
      hofSqDistLong($"a", $"b").as("s"))
    val plain = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    withRule {
      val rewritten = q()
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("dotproductlong"), s"long dot not rewritten:\n$opt")
      assert(opt.contains("squareddistancelong"), s"sqdist not rewritten:\n$opt")
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        == plain)
    }
  }

  test("does not fire when the flag is off or the pattern differs") {
    import spark.implicits._
    val q = floatVecs.select(hofDotDouble($"a", $"b").as("d"))
    // flag off (default): untouched even with the rule installed
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ NativeVectorRewrite
    try
      assert(!q.queryExecution.optimizedPlan.toString.contains("dotproduct"))
    finally spark.experimental.extraOptimizations = prev
    withRule {
      // a fold that is NOT a dot product (max-combine) must survive
      val notDot = floatVecs.select(
        aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => greatest(acc, v)).as("m"))
      val opt = notDot.queryExecution.optimizedPlan.toString
      assert(!opt.contains("dotproduct"), s"greatest-fold wrongly rewritten:\n$opt")
    }
  }

  test("native sqdist_long agrees with the HOF fold (fuzz)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val both = longVecs.select(
      call_function("sqdist_long", $"a", $"b").as("native"),
      hofSqDistLong($"a", $"b").as("hof")).collect()
    for (r <- both) assert(r.getLong(0) == r.getLong(1))
  }
}
