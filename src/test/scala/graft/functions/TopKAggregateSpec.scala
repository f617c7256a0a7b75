package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionTestWrapper

/** The bounded top-k aggregate must reproduce a deterministic
  * row_number-window rank exactly — it replaces per-key windows in t17/t23
  * precisely so a whole group never sorts in one task, and the swap is only
  * safe if the results are row-identical. */
class TopKAggregateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("top-k over (long desc, long asc) equals the row_number window") {
    import spark.implicits._
    TopKAggregate.register(spark, k = 5, desc = Seq(true, false), "tk_ll")
    // 40 groups x ~200 rows over 8 partitions: partial update, shuffle
    // serialize/deserialize, and final merge all run; duplicate sizes make
    // the doc_id tie-break load-bearing
    val df = spark.range(8000).repartition(8).select(
      ($"id" % 40).as("source"),
      ($"id" % 17).as("n_chars"),
      $"id".as("doc_id"))
    val got = df.groupBy($"source")
      .agg(TopKAggregate.topK("tk_ll", struct($"n_chars", $"doc_id")).as("top"))
      .select($"source", posexplode($"top"))
      .select($"source", $"col.doc_id".as("doc_id"),
        ($"pos" + 1).cast("long").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n_chars".desc, $"doc_id".asc)
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.size == 40 * 5)
  }

  test("top-k over (double desc, string asc) equals the window, including " +
    "groups smaller than k") {
    import spark.implicits._
    TopKAggregate.register(spark, k = 4, desc = Seq(true, false), "tk_ds")
    val df = spark.range(500).repartition(7).select(
      ($"id" % 97).as("source"),
      round(($"id" % 13).cast("double") / 7, 4).as("score"),
      concat(lit("term"), $"id" % 11).as("term"),
      $"id".as("payload"))
    // score ties within a group are broken by the term string, and term
    // collisions are avoided by construction (id % 13 vs % 11 misalign);
    // groups of 97 sources over 500 rows leave many groups with < 4 rows
    val deduped = df.groupBy($"source", $"score", $"term")
      .agg(min($"payload").as("payload"))
    val got = deduped.groupBy($"source")
      .agg(TopKAggregate.topK("tk_ds",
        struct($"score", $"term", $"payload")).as("top"))
      .select($"source", posexplode($"top"))
      .select($"source", $"col.term", $"col.payload",
        ($"pos" + 1).cast("long").as("rk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"score".desc, $"term".asc)
    val want = deduped.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 4)
      .select($"source", $"term", $"payload", $"rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
  }

  test("groups never exceed k rows and ranks are 1..k in struct order") {
    import spark.implicits._
    TopKAggregate.register(spark, k = 3, desc = Seq(false), "tk_asc")
    val rows = spark.range(100).select(($"id" % 4).as("g"), $"id".as("v"))
      .groupBy($"g")
      .agg(TopKAggregate.topK("tk_asc", struct($"v")).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.v".as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 4 * 3)
    // ascending: each group keeps its 3 smallest values in order g, g+4, g+8
    for ((g, pos, v) <- rows) assert(v == g + 4L * pos,
      s"group $g pos $pos held $v")
  }
}
