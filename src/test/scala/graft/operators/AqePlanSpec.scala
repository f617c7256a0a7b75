package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSessionTestWrapper}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** AQE-ON plan spot-checks for the heaviest non-genomic lanes (r14 verdict
  * ask #5). [[PlanBudgetSpec]] pins STATIC plans (AQE off); production runs
  * AQE on, and AQE can lawfully REWRITE a plan at runtime — demote a
  * sort-merge join it mis-sized, insert a re-balance, or (the failure this
  * spec exists to catch) turn an equi-join with an empty/skewed side into a
  * broadcast nested loop. Here each lane EXECUTES under AQE at the bench
  * gate scale (sf0.1 — runtime stats at toy scale would make every join
  * broadcastable and prove nothing), then the FINAL adaptive plan is
  * walked: materialized shuffle count must stay within the same static
  * budget (no extra exchange materialized), and no nested-loop join may
  * appear.
  */
class AqePlanSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.1"

  /** lane -> static shuffle budget from PlanBudgetSpec (AQE must not beat it) */
  private val lanes = Seq(
    "t06_minhash_lsh" -> 2,
    "t21_span_dedup" -> 3,
    "c02_semantic_dedup" -> 1,
    // the flagship classify path: AQE must not demote the one-sided
    // bucketed sort-merge join into something that re-shuffles the index
    // side or adds a nested loop (r17 guard — the 100 TB classify topology)
    "g03_classify" -> 6)

  /** Walk an executed adaptive plan, descending into materialized query
    * stages (QueryStageExec.plan is not a `children` edge) but NOT into
    * reused exchanges (a reuse is not a second materialization). */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Nil
      case other => other.children
    }
    p +: kids.flatMap(walk)
  }

  test("t06/t21/c02 under AQE at sf0.1: no extra materialized exchange, " +
    "no nested-loop join introduced") {
    assume(new java.io.File(dir).isDirectory)
    val violations = lanes.flatMap { case (name, staticBudget) =>
      val ss = spark.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "true")
      val df = SparkEntry.all(name).fn(ss, dir)
      df.write.format("noop").mode("overwrite").save() // materialize: AQE finalizes per stage
      val nodes = walk(df.queryExecution.executedPlan)
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
      val nested = nodes.count {
        case _: CartesianProductExec | _: BroadcastNestedLoopJoinExec => true
        case _ => false
      }
      (if (shuffles > staticBudget)
         Seq(s"$name: AQE materialized $shuffles shuffles > static budget $staticBudget")
       else Nil) ++
        (if (nested > 0) Seq(s"$name: AQE introduced $nested nested-loop joins")
         else Nil)
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
