package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the ADVICE r16 question: does the fragsU dedup
  * groupBy subtree in Bracken.weights (two consumers: the mins scan and
  * the window join) actually re-execute, or is its exchange reused at
  * runtime? PlanBudgetSpec says "not reusable" (column pruning gives the
  * consumers different aggregate shapes); the Bracken.weights comment
  * claimed "reused by AQE stage cache". Run once, read the final AQE plan,
  * keep whichever comment the plan supports.
  *
  * Run: `sbt "runMain graft.tools.WeightsPlanProbe /root/testdata/sf0.001"`
  */
object WeightsPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("weights-plan-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import graft.operators.GenomicQueries

    val df = GenomicQueries.queries.find(_.name == "g05_bracken").get
      .fn(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
    val aggs = plan.linesIterator.count(l =>
      l.contains("ObjectHashAggregate") || l.contains("HashAggregate"))
    println(s"=== ReusedExchange nodes: $reused; aggregate nodes: $aggs ===")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("first(")).mkString("\n"))
    spark.stop()
  }
}
