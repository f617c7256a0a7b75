package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper

/** The persistent ANN index (build/probe split): probe-only answers must
  * match the one-shot [[Similarity.ivfPqKnn]] byte-for-byte, engage
  * partition pruning on the probed cells, and never touch a training or
  * encode path. */
class AnnIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def randomVec(dim: Int = 64, seed: Int = 7): Array[Float] = {
    val rng = new scala.util.Random(seed)
    Array.fill(dim)(rng.nextGaussian().toFloat)
  }

  private lazy val base: Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(11)
    val anchors = (0L until 40L).map(i =>
      (i, Array.fill(64)(rng.nextGaussian().toFloat)))
    val close = anchors.take(10).map { case (i, v) =>
      (i + 500L, v.map(x => x + 0.05f * rng.nextGaussian().toFloat))
    }
    anchors ++ close
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, -t._3, t._2)).toSeq

  test("build + query matches the one-shot IVF-PQ byte-for-byte, sharded " +
    "or not, and the model sidecar round-trips exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val ds = spark.createDataset(base)
    val queries = spark.createDataset(base.filter(_._1 < 10))
    val model = AnnIndex.build(ds, dir, nCells = 8, subspaces = 8,
      centroids = 16, trainN = 64, iters = 3)
    // sidecar round-trip: the integer model is losslessly text-serialized
    val loaded = AnnIndex.readModel(spark, s"$dir/model.tsv")
    assert(loaded.coarse.map(_.toSeq).toSeq == model.coarse.map(_.toSeq).toSeq)
    assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
      model.books.map(_.map(_.toSeq).toSeq).toSeq)
    // probe-only result == the one-shot path (training + encode re-run)
    val oneShot = rows(Similarity.ivfPqKnn(queries, ds, k = 3, nCells = 8,
      nProbe = 3, subspaces = 8, centroids = 16, rerank = 24, trainN = 64))
    val probed = rows(AnnIndex.query(queries, dir, k = 3, nProbe = 3,
      rerank = 24))
    assert(probed == oneShot, "index probe diverges from one-shot IVF-PQ")
    // the sharded query side is shared: a sub-Q bound changes nothing
    val sharded = rows(AnnIndex.query(queries, dir, k = 3, nProbe = 3,
      rerank = 24, queryBound = 3))
    assert(sharded == oneShot, "sharded index probe diverges")
  }

  test("probe scan prunes to the probed cells (partition pruning) and " +
    "reads only the code column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx2").toString
    val ds = spark.createDataset(base)
    AnnIndex.build(ds, dir, nCells = 8, subspaces = 8, centroids = 16,
      trainN = 64)
    // one query, nProbe = 2 of 8 cells: the scan must not read the rest
    val queries = spark.createDataset(base.filter(_._1 == 0L))
    val res = AnnIndex.query(queries, dir, k = 3, nProbe = 2, rerank = 8)
    res.collect() // force execution so the executed plan is final
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      s"no partition filter in the probe plan:\n$plan")
    assert(plan.contains("cell#") && plan.contains(" IN ("),
      s"cell IN (...) pruning missing from the probe plan:\n$plan")
    // the data-reading scan projects codes, never decodes/encodes vectors
    assert(plan.contains("ReadSchema: struct<nid:bigint,code:binary>") ||
      plan.contains("ReadSchema: struct<code:binary,nid:bigint>"),
      s"probe scan reads more than (nid, code):\n$plan")
  }

  test("append encodes a new batch with the stored model: probe results " +
    "are byte-identical to a combined build trained on the same sample") {
    import spark.implicits._
    val dirInc = java.nio.file.Files.createTempDirectory("annidx-inc").toString
    val dirAll = java.nio.file.Files.createTempDirectory("annidx-all").toString
    // A = the 40 smallest ids, B = the rest; trainN = 40 makes the
    // combined build's deterministic sample exactly A's vectors, so both
    // indexes carry the SAME model and the comparison is exact, not
    // approximate
    val a = spark.createDataset(base.filter(_._1 < 500))
    val b = spark.createDataset(base.filter(_._1 >= 500))
    val all = spark.createDataset(base)
    val mA = AnnIndex.build(a, dirInc, nCells = 8, subspaces = 8,
      centroids = 16, trainN = 40)
    AnnIndex.append(b, dirInc)
    val mAll = AnnIndex.build(all, dirAll, nCells = 8, subspaces = 8,
      centroids = 16, trainN = 40)
    assert(mA.coarse.map(_.toSeq).toSeq == mAll.coarse.map(_.toSeq).toSeq &&
      mA.books.map(_.map(_.toSeq).toSeq).toSeq ==
        mAll.books.map(_.map(_.toSeq).toSeq).toSeq,
      "fixture broken: the two models must coincide for an exact compare")
    val queries = spark.createDataset(base.filter(_._1 < 10))
    val inc = rows(AnnIndex.query(queries, dirInc, k = 3, nProbe = 3,
      rerank = 24))
    val full = rows(AnnIndex.query(queries, dirAll, k = 3, nProbe = 3,
      rerank = 24))
    assert(inc == full, "appended index diverges from the combined build")
    // the appended batch is genuinely probed: planted twins live in B
    val top1 = inc.groupBy(_._1).map { case (q, rs) => q -> rs.head._2 }
    val hits = (0L until 10L).count(q => top1.get(q).contains(q + 500L))
    assert(hits >= 8, s"append lost the planted neighbors: $hits of 10")
  }

  test("streaming probe: each micro-batch is batch-equal to query() on " +
    "the same rows, with the model loaded once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("annidx-st").toString
    AnnIndex.build(spark.createDataset(base), dir, nCells = 8, subspaces = 8,
      centroids = 16, trainN = 64)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float])]
    val results = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long, Double)]]
    val q = AnnIndex.queryStream(stream.toDS(), dir, k = 3, nProbe = 3,
        rerank = 24) { (batchId, knn) =>
      results.synchronized { results(batchId) = rows(knn) }
    }.start()
    try {
      val batch1 = base.filter(_._1 < 5)
      val batch2 = base.filter(t => t._1 >= 5 && t._1 < 10)
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      assert(results.size == 2)
      for ((batch, id) <- Seq(batch1 -> 0L, batch2 -> 1L)) {
        val viaBatch = rows(AnnIndex.query(spark.createDataset(batch), dir,
          k = 3, nProbe = 3, rerank = 24))
        assert(results(id) == viaBatch, s"batch $id diverges from query()")
      }
    } finally q.stop()
  }

  test("query answers from the index alone: the corpus source is gone and " +
    "no training path runs") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("annsrc").toString
    val dir = java.nio.file.Files.createTempDirectory("annidx3").toString
    // build from a parquet corpus, then DELETE it — probe-only must not
    // notice (ivfPqKnn would fail here: it re-trains from the base)
    spark.createDataset(base).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(srcDir)
    val src = spark.read.parquet(srcDir)
      .select($"vec_id".as[Long], $"embedding".as[Array[Float]])
    AnnIndex.build(src, dir, nCells = 8, subspaces = 8, centroids = 16,
      trainN = 64)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rm(_))
      java.nio.file.Files.delete(p)
    }
    rm(java.nio.file.Paths.get(srcDir))
    val queries = spark.createDataset(base.filter(_._1 < 10))
    val got = AnnIndex.query(queries, dir, k = 1, nProbe = 3, rerank = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 10L).count(q => got.get(q).contains(q + 500L))
    assert(hits >= 8, s"probe-only found just $hits of 10 planted neighbors")
  }

  test("recallCheck gauges healthy recall on the trained distribution and " +
    "flags rebuild-recommended after a drifted append") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("anndrift").toString
    val rng = new scala.util.Random(31)
    // 4 well-separated axis-block clusters of 60: coarse cells align with
    // clusters, so the trained index answers its own distribution well
    val clustered = for (c <- 0 until 4; i <- 0 until 60) yield {
      val v = Array.tabulate(16)(d =>
        (if (d / 4 == c) 1.0f else 0.05f) + 0.05f * rng.nextGaussian().toFloat)
      ((c * 60 + i).toLong, v)
    }
    AnnIndex.build(spark.createDataset(clustered), dir, nCells = 4,
      subspaces = 4, centroids = 16, trainN = 240, iters = 3)
    // healthy: default sample = highest nids (cluster 3); their true
    // neighbors share the cell, candidates cover the whole cluster
    val healthy = AnnIndex.recallCheck(spark, dir, sampleN = 20, k = 5,
      nProbe = 2, rerank = 64, threshold = 0.8)
    assert(healthy.sampled == 20)
    assert(healthy.recall > 0.8, s"healthy recall ${healthy.recall}")
    assert(!healthy.rebuildRecommended)
    // drifted append: 300 vectors in a tight far-away cluster. Residuals
    // against every trained centroid are huge, so PQ codes collapse to
    // near-identical values and the ADC pre-rank stops discriminating —
    // with rerank < cluster size the true neighbors rarely survive to the
    // exact re-rank. This is the silent degradation the gauge exists for.
    val drifted = (0 until 300).map { i =>
      ((1000 + i).toLong,
        Array.tabulate(16)(_ => 50.0f + 0.5f * rng.nextGaussian().toFloat))
    }
    AnnIndex.append(spark.createDataset(drifted), dir)
    // default sample picks the appended batch (highest nids)
    val drifty = AnnIndex.recallCheck(spark, dir, sampleN = 20, k = 5,
      nProbe = 2, rerank = 8, threshold = 0.8)
    assert(drifty.sampled == 20)
    assert(drifty.recall < healthy.recall,
      s"drifted recall ${drifty.recall} not below healthy ${healthy.recall}")
    assert(drifty.rebuildRecommended,
      s"drifted batch did not trip the flag (recall ${drifty.recall})")
  }
}
