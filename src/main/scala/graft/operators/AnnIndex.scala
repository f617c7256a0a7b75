package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Persistent IVF-PQ index: the build/probe split of [[Similarity.ivfPqKnn]],
  * mirroring the genomic index lifecycle (train/encode once, probe many).
  *
  * [[Similarity.ivfPqKnn]] re-trains the quantizers and re-encodes the whole
  * corpus on every call — right for one-shot jobs, wrong for a serving
  * workload where the corpus is stable and query batches keep arriving.
  * [[build]] runs the training + encode pass once and persists:
  *
  *   - `<dir>/vectors/` — parquet partitioned by coarse cell, columns
  *     (nid, code, vec). A probe reads ONLY the `nProbe` probed cells
  *     (partition pruning, plan-asserted in the spec) and ONLY the S-byte
  *     `code` column (column pruning) — at 100 TB the scan cost drops to
  *     `nProbe/nCells` of the corpus at ~32x fewer bytes per row; `vec` is
  *     touched just for the bounded re-rank join.
  *   - `<dir>/model.tsv` — the coarse centroids + residual codebooks as
  *     exact longs (a few KB; the integer Lloyd's makes the whole model
  *     losslessly serializable as text).
  *
  * [[query]] loads the sidecar and probes: NO training code path exists in
  * it — the spec proves a probe-only run answers from the index alone and
  * matches the one-shot [[Similarity.ivfPqKnn]] byte-for-byte on the same
  * parameters. The query side shares [[Similarity.shardedKnn]], so query
  * sets beyond the driver bound auto-shard exactly like the one-shot path.
  */
object AnnIndex {

  /** The trained quantizer pair, exactly [[Similarity.ivfPqKnn]]'s internal
    * model: coarse centroids `[cell][dim]` and residual PQ codebooks
    * `[subspace][centroid][subDim]`, all milli-quantized longs. */
  case class Model(coarse: Array[Array[Long]],
      books: Array[Array[Array[Long]]]) {
    def nCells: Int = coarse.length
    def dim: Int = coarse(0).length
    def subspaces: Int = books.length
    def centroids: Int = books(0).length
  }

  /** Train the coarse + residual quantizers (the [[Similarity.ivfPqKnn]]
    * training contract: deterministic first-`trainN`-ids sample, exact
    * integer Lloyd's, residual codebooks) and persist the encoded corpus
    * partitioned by cell. One narrow encode pass over the base; the model
    * sidecar is driver-side text. Returns the trained model. */
  def build(base: Dataset[(Long, Array[Float])], dir: String, nCells: Int = 8,
      subspaces: Int = 8, centroids: Int = 16, trainN: Int = 256,
      iters: Int = 3, scatter: Boolean = false): Model = {
    val spark = base.sparkSession
    import spark.implicits._
    require(centroids <= 256, s"PQ codes are one byte: centroids <= 256, got $centroids")
    val sample = Similarity.collectTrainSample(base, trainN, scatter)
    val coarse = Similarity.trainSubspaceCodebooks(sample, 1, nCells, iters)(0)
    val dim = sample(0).length
    val sampRes = sample.map { v =>
      val c = Similarity.nearestSub(v, 0, dim, coarse)
      Array.tabulate(dim)(i => v(i) - coarse(c)(i))
    }
    val books = Similarity.trainSubspaceCodebooks(sampRes, subspaces,
      centroids, iters)
    val model = Model(coarse, books)
    encodeWrite(model, base, dir, overwrite = true)
    writeModel(spark, s"$dir/model.tsv", model)
    model
  }

  /** Append a NEW vector batch to an existing index, encoded with the
    * STORED model — the incremental half of the serving lifecycle: the
    * corpus grows, only the new batch pays an encode pass, probes see the
    * union immediately (same cells, same codebooks, so the ADC arithmetic
    * is bit-identical to a build that encoded everything with this model —
    * spec-asserted). The quantizers are NOT retrained: like any IVF
    * system, heavy drift in the data distribution eventually degrades
    * recall and warrants a rebuild. Caller owns nid uniqueness across
    * batches, as with any index append. */
  def append(base: Dataset[(Long, Array[Float])], dir: String): Model = {
    val model = readModel(base.sparkSession, s"$dir/model.tsv")
    encodeWrite(model, base, dir, overwrite = false)
    model
  }

  /** Result of [[recallCheck]]: measured probe recall@k of a query sample
    * against exact brute force, and whether it sank below the threshold. */
  case class RecallReport(sampled: Int, k: Int, recall: Double,
      threshold: Double, rebuildRecommended: Boolean)

  /** Recall-drift gauge for a served index: [[append]] never retrains the
    * quantizers, so a drifted batch (vectors far from every trained cell)
    * degrades ANN recall SILENTLY — huge residuals collapse to
    * near-identical PQ codes and the ADC pre-rank stops discriminating.
    * This makes the degradation a measured number: probe recall@k of a
    * small query sample versus exact brute-force cosine over the stored
    * corpus, with `rebuildRecommended` set when recall < `threshold`.
    *
    * The sample defaults to the `sampleN` HIGHEST-nid stored vectors — the
    * most recently appended rows under the monotone nid assignment most
    * loaders use — so "check after append" gauges exactly the batch that
    * could have drifted; pass `queries` to gauge an explicit set instead.
    *
    * Cost: one probe (`nProbe/nCells` of the corpus, code column only) +
    * one full-corpus scan with `sampleN` dot products per row — a gauge,
    * not a per-query tax; run it after appends, not per probe. */
  def recallCheck(spark: SparkSession, dir: String, sampleN: Int = 64,
      k: Int = 10, nProbe: Int = 3, rerank: Int = 32, threshold: Double = 0.9,
      queries: Option[Dataset[(Long, Array[Float])]] = None): RecallReport = {
    import spark.implicits._
    val table = spark.read.parquet(s"$dir/vectors")
    val q = queries.getOrElse {
      table.select(col("nid").cast("long"), col("vec"))
        .orderBy(col("nid").desc).limit(sampleN)
        .as[(Long, Array[Float])]
    }.cache()
    try {
      val nQ = q.count().toInt
      val approx = query(q, dir, k, nProbe, rerank)
        .select(col("qid"), col("nid"))
      val exact = Similarity.bruteForceKnn(
        q.toDF("id", "vec"),
        table.select(col("nid").cast("long").as("id"), col("vec")), k)
        .select(col("qid"), col("nid"))
      // recall@k = |approx ∩ exact| / |exact| (exact has k rows per query
      // except on corpora smaller than k+1, hence the measured denominator)
      val hit = approx.join(exact, Seq("qid", "nid")).count()
      val denom = exact.count()
      val recall = if (denom == 0) 1.0 else hit.toDouble / denom
      RecallReport(nQ, k, recall, threshold, recall < threshold)
    } finally q.unpersist(false)
  }

  /** The one narrow encode pass + cell-partitioned write shared by
    * [[build]] (overwrite) and [[append]] (append). */
  private def encodeWrite(model: Model, base: Dataset[(Long, Array[Float])],
      dir: String, overwrite: Boolean): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    val bcCoarse = spark.sparkContext.broadcast(model.coarse)
    val bcBooks = spark.sparkContext.broadcast(model.books)
    val dim = model.dim
    val encoded = base.filter(_._2 != null).map { case (id, v) =>
      // fail loudly on a batch whose vectors don't match the model: a
      // smaller dim would otherwise encode silently-wrong prefix codes
      require(v.length == dim,
        s"vector $id has dim ${v.length}, the index model expects $dim")
      val co = bcCoarse.value
      val qvl = Similarity.quantizeJvm(v)
      val cell = Similarity.nearestSub(qvl, 0, qvl.length, co)
      val res = Array.tabulate(qvl.length)(i => qvl(i) - co(cell)(i))
      (id, cell, Similarity.pqEncode(res, bcBooks.value), v)
    }.toDF("nid", "cell", "code", "vec")
    // repartition ON the partition column first: each cell's rows land in
    // one task, so partitionBy emits one file per cell (per batch) instead
    // of (tasks x cells) shards — codes are S bytes/row, so even
    // billion-row cells stay block-sized; raise with repartition(n,
    // $"cell") if not
    encoded.repartition(col("cell"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("cell").parquet(s"$dir/vectors")
  }

  /** Probe a built index: top-`k` exact-cosine neighbors per query, ADC
    * scan over the probed cells' codes + exact re-rank of the global
    * top-`rerank` — the same arithmetic, probe rule, tie-breaks and
    * candidate semantics as [[Similarity.ivfPqKnn]], minus its training
    * and encode passes. Reads only the index directory. */
  def query(queries: Dataset[(Long, Array[Float])], dir: String, k: Int,
      nProbe: Int = 3, rerank: Int = 32,
      queryBound: Int = Similarity.DefaultQueryShardBound): DataFrame = {
    val spark = queries.sparkSession
    queryLoaded(queries, readModel(spark, s"$dir/model.tsv"),
      spark.read.parquet(s"$dir/vectors"), k, nProbe, rerank, queryBound)
  }

  /** [[query]] against an already-loaded model + vectors frame — the
    * serving form: load once, probe many (the streaming probe and any
    * driver loop reuse the same model and table plan across calls). */
  def queryLoaded(queries: Dataset[(Long, Array[Float])], model: Model,
      table: DataFrame, k: Int, nProbe: Int = 3, rerank: Int = 32,
      queryBound: Int = Similarity.DefaultQueryShardBound): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val coarse = model.coarse
    val books = model.books
    val nCells = model.nCells
    val dim = model.dim
    val subspaces = model.subspaces
    val centroids = model.centroids
    val sub = dim / subspaces
    // the exact-long lookup tables of the ADC decomposition (ivfPqKnn's):
    //   dot(q, c + r̂) = dot(q, c) + Σ_s dotTable[s][code_s]
    //   ‖c + r̂‖²      = ‖c‖² + 2·Σ_s cross[cell][s][code_s] + Σ_s n2[s][code_s]
    val centNorm2 = coarse.map { m => var d = 0L; m.foreach(x => d += x * x); d }
    val n2 = Array.tabulate(subspaces, centroids) { (s, j) =>
      var d = 0L; books(s)(j).foreach(x => d += x * x); d
    }
    val cross = Array.tabulate(nCells, subspaces, centroids) { (c, s, j) =>
      var d = 0L; var i = 0
      while (i < sub) { d += coarse(c)(s * sub + i) * books(s)(j)(i); i += 1 }
      d
    }
    Similarity.shardedKnn(queries, queryBound) { qArr =>
      import spark.implicits._
      for ((qid, qv) <- qArr) require(qv.length == dim,
        s"query $qid has dim ${qv.length}, the index model expects $dim")
      val nP = math.min(nProbe, nCells)
      val qProbes = qArr.map { case (_, qv) =>
        Similarity.probeCells(Similarity.quantizeJvm(qv), coarse, nP)
      }
      val qTables = qArr.zip(qProbes).map { case ((qid, qv), probed) =>
        val qvl = Similarity.quantizeJvm(qv)
        val dotQC = probed.map { c =>
          var d = 0L; var i = 0
          while (i < dim) { d += qvl(i) * coarse(c)(i); i += 1 }
          c -> d
        }.toMap
        val tab = Array.tabulate(subspaces, centroids) { (s, j) =>
          var d = 0L; var i = 0
          while (i < sub) { d += qvl(s * sub + i) * books(s)(j)(i); i += 1 }
          d
        }
        var qn = 0L
        qvl.foreach(x => qn += x * x)
        (qid, dotQC, tab, math.sqrt(qn.toDouble))
      }
      val cellQueries = Similarity.invertProbes(qProbes, nCells)
      val probed = qProbes.flatten.distinct.sorted
      val bcQ = spark.sparkContext.broadcast(qTables)
      val bcCellQ = spark.sparkContext.broadcast(cellQueries)
      val bcCross = spark.sparkContext.broadcast(cross)
      val bcN2 = spark.sparkContext.broadcast(n2)
      val bcCN = spark.sparkContext.broadcast(centNorm2)
      val rr = rerank.max(k)

      // the probe scan: cell isin(probed) prunes PARTITIONS (only
      // nProbe-ish cells are read at all), the projection prunes to the
      // S-byte code column — no quantize/encode per row, unlike the
      // one-shot path
      val codes = table
        .select(col("nid").cast("long"), col("cell").cast("int"), col("code"))
        .filter(col("cell").isin(probed.map(c => c: Any): _*))
        .as[(Long, Int, Array[Byte])]
      val scored = codes.mapPartitions { it =>
        val qs = bcQ.value
        val cellQ = bcCellQ.value
        val crossT = bcCross.value
        val n2T = bcN2.value
        val cn = bcCN.value
        val heapSim = Array.fill(qs.length)(new Array[Double](rr))
        val heapId = Array.fill(qs.length)(new Array[Long](rr))
        val heapN = new Array[Int](qs.length)
        for ((nid, cell, code) <- it) {
          val qIdxs = cellQ(cell)
          var qi = 0
          while (qi < qIdxs.length) {
            val q = qIdxs(qi)
            val (qid, dotQC, tab, qnorm) = qs(q)
            if (qid != nid) {
              var dot = dotQC(cell)
              var nn = cn(cell)
              var s = 0
              while (s < code.length) {
                val j = code(s) & 0xff
                dot += tab(s)(j)
                nn += 2 * crossT(cell)(s)(j) + n2T(s)(j)
                s += 1
              }
              val sim = if (qnorm == 0.0 || nn <= 0L) 0.0
                else dot.toDouble / (qnorm * math.sqrt(nn.toDouble))
              heapN(q) = Similarity.boundedInsert(heapSim(q), heapId(q),
                heapN(q), rr, sim, nid)
            }
            qi += 1
          }
        }
        Similarity.drainHeaps(qs.map(_._1), heapSim, heapId, heapN)
      }.toDF("qid", "nid", "asim")
      val wa = Window.partitionBy(col("qid"))
        .orderBy(col("asim").desc, col("nid").asc)
      val candidates = scored
        .withColumn("rn", row_number().over(wa)).filter(col("rn") <= rr)
        .select("qid", "nid")
      // exact re-rank: true vectors for the surviving candidates only —
      // the vec side also prunes to the probed cells (candidates can only
      // come from them)
      val vecSide = table.filter(col("cell").isin(probed.map(c => c: Any): _*))
        .select(col("nid").cast("long"), col("vec"))
      val qDf = queries.toDF("qid", "qv")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      val res = candidates.join(vecSide, "nid").join(qDf, "qid")
        .select(col("qid"), col("nid"),
          Similarity.cosineCol(col("qv"), col("vec")).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .drop("rn")
      (res, () => {
        bcQ.destroy(); bcCellQ.destroy(); bcCross.destroy()
        bcN2.destroy(); bcCN.destroy()
      })
    }
  }

  /** Streaming probe of a built index — the online serving loop: query
    * vectors stream in, each micro-batch probes the static cell-
    * partitioned codes with exactly the batch [[query]] kernel. The model
    * sidecar and the vectors frame load ONCE before the stream starts
    * (per-batch work is the probe scan + bounded re-rank only); results
    * are batch-equal to [[query]] over the same rows (spec-asserted),
    * following the [[graft.streaming.StreamingClassifier]] foreachBatch
    * stream-static topology. */
  def queryStream(queries: Dataset[(Long, Array[Float])], dir: String,
      k: Int, nProbe: Int = 3, rerank: Int = 32,
      queryBound: Int = Similarity.DefaultQueryShardBound)(
      sink: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[(Long, Array[Float])] = {
    require(queries.isStreaming, "queries must be a streaming Dataset")
    val spark = queries.sparkSession
    val model = readModel(spark, s"$dir/model.tsv")
    val table = spark.read.parquet(s"$dir/vectors")
    queries.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: Dataset[(Long, Array[Float])], batchId: Long) =>
        sink(batchId,
          queryLoaded(batch, model, table, k, nProbe, rerank, queryBound))
      }
  }

  /** The sidecar format: header line `ann <dim> <nCells> <subspaces>
    * <centroids>`, then one `cell <c> v...` line per coarse centroid and
    * one `book <s> <c> v...` line per codebook entry — whitespace-split
    * longs, no parser dependency, diffable. */
  private def writeModel(spark: SparkSession, path: String, m: Model): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new java.io.PrintWriter(fs.create(p, true), false,
      java.nio.charset.StandardCharsets.UTF_8)
    try {
      w.println(s"ann ${m.dim} ${m.nCells} ${m.subspaces} ${m.centroids}")
      for (c <- 0 until m.nCells)
        w.println(s"cell $c ${m.coarse(c).mkString(" ")}")
      for (s <- 0 until m.subspaces; c <- 0 until m.centroids)
        w.println(s"book $s $c ${m.books(s)(c).mkString(" ")}")
    } finally w.close()
  }

  def readModel(spark: SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = scala.io.Source.fromInputStream(fs.open(p))
    val lines = try src.getLines().toVector finally src.close()
    val header = lines.head.split(" ")
    require(header(0) == "ann", s"not an ANN model sidecar: $path")
    val (dim, nCells, subspaces, centroids) =
      (header(1).toInt, header(2).toInt, header(3).toInt, header(4).toInt)
    val coarse = Array.ofDim[Array[Long]](nCells)
    val books = Array.ofDim[Array[Long]](subspaces, centroids)
    for (line <- lines.tail) {
      val t = line.split(" ")
      t(0) match {
        case "cell" => coarse(t(1).toInt) = t.drop(2).map(_.toLong)
        case "book" => books(t(1).toInt)(t(2).toInt) = t.drop(3).map(_.toLong)
        case other => sys.error(s"unknown model line kind '$other' in $path")
      }
    }
    require(coarse.forall(c => c != null && c.length == dim) &&
      books.forall(_.forall(b => b != null && b.length == dim / subspaces)),
      s"model sidecar $path is incomplete")
    Model(coarse, books)
  }
}
