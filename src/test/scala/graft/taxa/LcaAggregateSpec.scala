package graft.taxa

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.functions._
import scala.util.Random

/** Focused spec for the r21 DeclarativeAggregate form of [[LcaAggregate]]
  * (previously a TypedImperativeAggregate): same algebra (zero = NONE,
  * merge = LCA, associative + commutative), new execution class. Pins
  *  - fold equality against a driver-side reference fold over the same
  *    taxonomy, across many partitions (partial + merge paths exercised),
  *  - null inputs keep the buffer (the old update's null arm),
  *  - the plan property the rewrite exists for: the fold aggregates in
  *    HashAggregateExec (fixed-width codegen hash map), NOT
  *    ObjectHashAggregateExec (whose 128-key sort-based fallback made
  *    every index-build fold pay a per-row sort it never needed). */
class LcaAggregateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  // a 3-level taxonomy: root(1) <- genus 2,3 <- species 10..29
  private lazy val tax = Taxonomy.fromTuples(
    Seq((2, 1, "genus", "g2"), (3, 1, "genus", "g3")) ++
      (10 to 29).map(t => (t, 2 + t % 2, "species", s"s$t")))

  test("declarative lca_agg == driver-side LCA fold across partitions; " +
    "nulls keep the buffer; plan is HashAggregate") {
    val ss = spark.newSession()
    import ss.implicits._
    val bcTax = ss.sparkContext.broadcast(tax)
    val rng = new Random(2121)
    val rows = (0 until 5000).map { i =>
      (i % 37, if (rng.nextInt(20) == 0) None else Some(10 + rng.nextInt(20)))
    }
    val df = ss.createDataset(rows).toDF("k", "taxon")
      .select($"k", $"taxon".cast("int").as("taxon"))
      .repartition(13) // force partial buffers to merge across partitions
    val name = LcaAggregate.register(ss, bcTax)
    val got = df.groupBy($"k")
      .agg(LcaAggregate.lcaAgg(name, $"taxon").as("lca"))
      .as[(Int, Int)].collect().toMap

    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.flatMap(_._2).foldLeft(Taxonomy.NONE)((b, t) => tax.lca(b, t))
    }
    assert(got == expected)

    // an all-null group folds to NONE (the old null-arm semantics)
    val nulls = ss.createDataset(Seq((1, Option.empty[Int]), (1, None)))
      .toDF("k", "taxon").select($"k", $"taxon".cast("int").as("taxon"))
    val gotNull = nulls.groupBy($"k")
      .agg(LcaAggregate.lcaAgg(name, $"taxon").as("lca"))
      .as[(Int, Int)].collect().toMap
    assert(gotNull == Map(1 -> Taxonomy.NONE))

    val plan = df.groupBy($"k")
      .agg(LcaAggregate.lcaAgg(name, $"taxon").as("lca"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"),
      s"lca fold regressed to ObjectHashAggregate (sort-fallback path):\n$plan")
  }
}
