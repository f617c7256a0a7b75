package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.functions._

/** The default-on, row-guarded optimizer rule that swaps interpreted HOF
  * vector folds for the native codegen'd expressions. */
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
    // flag EXPLICITLY off: untouched even with the rule installed (the
    // rule is on by default — see the default-on test below)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ NativeVectorRewrite
    spark.conf.set(NativeVectorRewrite.ConfKey, "false")
    try {
      val q = floatVecs.select(hofDotDouble($"a", $"b").as("d"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("dotproduct"))
    } finally {
      spark.conf.unset(NativeVectorRewrite.ConfKey)
      spark.experimental.extraOptimizations = prev
    }
    withRule {
      // a fold that is NOT a dot product (max-combine) must survive
      val notDot = floatVecs.select(
        aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => greatest(acc, v)).as("m"))
      val opt = notDot.queryExecution.optimizedPlan.toString
      assert(!opt.contains("dotproduct"), s"greatest-fold wrongly rewritten:\n$opt")
    }
  }

  test("does not fire on non-deterministic children (guard would inspect " +
    "a different array than the native computes over)") {
    import spark.implicits._
    withRule {
      // shuffle(arr) re-evaluates differently per reference: the size/null
      // guard and the native would each see their own shuffle — skip
      val q = floatVecs.select(
        hofDotDouble(shuffle($"a"), $"b").as("d"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.toLowerCase.contains("dotproduct"),
        s"non-deterministic child wrongly rewritten:\n$opt")
    }
  }

  test("fires by default (no conf set) once the rule is installed") {
    import spark.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ NativeVectorRewrite
    try {
      val q = floatVecs.select(hofDotDouble($"a", $"b").as("d"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("dotproduct"), s"default-on rewrite did not fire:\n$opt")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("ragged arrays: guarded rewrite keeps the fold's NULL semantics") {
    import spark.implicits._
    // b is one element SHORTER on odd rows: zip_with pads with null and the
    // fold returns NULL there; the guarded native must reproduce exactly
    // that (If(size-equal, native, NULL)), never a truncated dot
    def ragged = spark.range(20).select(
      transform(sequence(lit(1), lit(8)),
        i => ((i * 7 + $"id") % 23 - 11).cast("float")).as("a"),
      transform(sequence(lit(1), (lit(8) - $"id" % 2).cast("int")),
        i => ((i * 13 + $"id" * 3) % 19 - 9).cast("float")).as("b"))
    def q() = ragged.select($"a", $"b", hofDotDouble($"a", $"b").as("d"))
    val plain = q().collect().map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(plain.count(_.isEmpty) == 10, "fixture must null half the rows")
    withRule {
      val rewritten = q()
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("dotproduct"), s"guarded rewrite did not fire:\n$opt")
      val got = rewritten.collect()
        .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      assert(got.toSeq == plain.toSeq,
        "guarded native diverged from the fold on ragged input")
    }
  }

  test("null elements: guarded rewrite keeps the fold's NULL semantics") {
    import spark.implicits._
    // element 3 of a is null on every third row; the schema cannot prove
    // density (containsNull = true), so the guard adds the exists(isnull)
    // scan and those rows must stay NULL
    def withNulls = spark.range(21).select(
      transform(sequence(lit(1), lit(8)), i =>
        when($"id" % 3 === 0 && i === 3, lit(null).cast("float"))
          .otherwise(((i * 7 + $"id") % 23 - 11).cast("float"))).as("a"),
      transform(sequence(lit(1), lit(8)),
        i => ((i * 13 + $"id" * 3) % 19 - 9).cast("float")).as("b"))
    def q() = withNulls.select(hofDotDouble($"a", $"b").as("d"))
    val plain = q().collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(plain.count(_.isEmpty) == 7, "fixture must null a third of the rows")
    withRule {
      val rewritten = q()
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("dotproduct"), s"guarded rewrite did not fire:\n$opt")
      val got = rewritten.collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(got.toSeq == plain.toSeq,
        "guarded native diverged from the fold on null elements")
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
