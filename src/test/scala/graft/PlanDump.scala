package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** One-off plan census over every registered lane: prints the static-plan
  * shuffle-exchange count and any nested-loop/cartesian join nodes per lane
  * at sf0.001. Used to derive (and re-derive after a refactor) the budgets
  * pinned in [[graft.operators.PlanBudgetSpec]].
  *
  * Run: sbt "Test/runMain graft.PlanDump [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // second arg: a single lane name — print its full formatted plan
    // instead of the census (for localizing a budget regression)
    for (lane <- args.lift(1)) {
      val ss = SparkSessionTestWrapper.session.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.all(lane).fn(ss, dir).explain("formatted")
      return
    }
    val base = SparkSessionTestWrapper.session
    println("lane\tshuffles\tnested_loop_joins")
    for ((name, q) <- SparkEntry.all) {
      val ss = base.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = q.fn(ss, dir).queryExecution.executedPlan
        val shuffles =
          plan.collectWithSubqueries { case s: ShuffleExchangeLike => s }.size
        val nested = plan.collectWithSubqueries {
          case c: CartesianProductExec => c
          case b: BroadcastNestedLoopJoinExec => b
        }.size
        println(s"$name\t$shuffles\t$nested")
      } catch {
        case e: Throwable => println(s"$name\tERROR\t${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }
}
