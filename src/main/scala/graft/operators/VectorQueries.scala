package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q.t

/** Embedding-column operators over the `embeddings` table (64-dim float
  * vectors). Dot products / norms are computed with codegen'd higher-order
  * functions (`transform` / `zip_with` / `aggregate`) — no UDFs — casting
  * each element to double before multiply so both engines do the identical
  * left-to-right double accumulation.
  *
  * Scale note: brute-force kNN is the O(Q·N) baseline; the LSH-bucketed
  * variant in [[Similarity]] is the 100 TB path (candidates only within
  * matching hyperplane-sign buckets).
  */
object VectorQueries {

  val queries: Seq[Q] = Seq(
    // ---- L2 norm per vector ----
    Q("v01_vector_norm", (s, dir) => {
      import s.implicits._
      val sq = transform($"embedding", x => x.cast("double") * x.cast("double"))
      t(s, dir, "embeddings")
        .select($"vec_id".cast("long").as("vec_id"),
          round(sqrt(aggregate(sq, lit(0.0), (acc, x) => acc + x)), 4).as("norm"))
        .orderBy($"vec_id")
    }, Some(
      """SELECT CAST(vec_id AS BIGINT) AS vec_id,
        | round(sqrt(list_sum(list_transform(embedding,
        |   x -> x::DOUBLE * x::DOUBLE))), 4) AS norm
        |FROM embeddings ORDER BY 1""".stripMargin)),

    // ---- brute-force cosine top-1 neighbor for the first 20 vectors ----
    Q("v02_knn_brute", (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x)
      val q = emb.select($"vec_id".as("qid"), $"embedding".as("qv")).filter($"qid" < 20)
      val base = emb.select($"vec_id".as("nid"), $"embedding".as("nv"))
      val sim = dot($"qv", $"nv") /
        (sqrt(dot($"qv", $"qv")) * sqrt(dot($"nv", $"nv")))
      val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"nid".asc)
      q.join(base, $"qid" =!= $"nid")
        .select($"qid", $"nid", sim.as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid")
    }, Some(
      """SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
        | round(sim, 6) AS sim
        |FROM (
        |  SELECT q.vec_id AS qid, b.vec_id AS nid,
        |   list_sum(list_transform(list_zip(q.embedding, b.embedding),
        |     p -> p[1]::DOUBLE * p[2]::DOUBLE)) /
        |   (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE))) *
        |    sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS sim,
        |   row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |     list_sum(list_transform(list_zip(q.embedding, b.embedding),
        |       p -> p[1]::DOUBLE * p[2]::DOUBLE)) /
        |     (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE))) *
        |      sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))
        |     DESC, b.vec_id ASC) AS rn
        |  FROM embeddings q JOIN embeddings b ON q.vec_id < 20 AND q.vec_id <> b.vec_id)
        |WHERE rn = 1 ORDER BY qid""".stripMargin)),

    // ---- per-label centroid distance: grouped vector aggregation ----
    Q("v03_label_stats", (s, dir) => {
      import s.implicits._
      val sq = transform($"embedding", x => x.cast("double") * x.cast("double"))
      t(s, dir, "embeddings")
        .select($"label".cast("long").as("label"),
          aggregate(sq, lit(0.0), (acc, x) => acc + x).as("sqn"))
        .groupBy($"label")
        .agg(count(lit(1)).cast("long").as("cnt"),
          round(avg($"sqn"), 4).as("avg_sqnorm"))
        .orderBy($"label")
    }, Some(
      """SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS cnt,
        | round(CAST(avg(sqn) AS DOUBLE), 4) AS avg_sqnorm
        |FROM (SELECT label, list_sum(list_transform(embedding,
        |   x -> x::DOUBLE * x::DOUBLE)) AS sqn FROM embeddings)
        |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
