package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TopKAggregate
import Q.t

/** Embedding-space curation: deterministic k-means, SemDeDup-style
  * within-cluster semantic dedup (Abbas et al. 2023 shape), and
  * temperature-balanced cluster sampling — the cluster/partition/resample
  * pillar of a training-data pipeline.
  *
  * Everything here is EXACT integer arithmetic so Spark, DuckDB and any
  * reimplementation agree bit-for-bit:
  *
  *   - vectors are quantized to milli-units once:
  *     q_i = floor(float64(x_i)·1000 + 0.5) as long. IEEE float64 multiply/
  *     add/floor are deterministic, so both engines derive identical longs;
  *   - distances/dot products are long arithmetic on quantized vectors
  *     (|q| ≤ ~525 ⇒ a 64-dim squared distance ≤ ~7·10^7, a dot ≤ ~1.8·10^7,
  *     its square ≤ 3.2·10^14 — inside both long and exact-double range);
  *   - centroid means round half-up on exact rationals:
  *     m_i = floorDiv(2·s_i + c, 2·c), never a floating mean;
  *   - every argmin breaks ties on the smallest cluster index via struct
  *     ordering (dist, cid).
  *
  * Scale shape: Lloyd's is iters+1 full scans; the training rounds run as
  * one treeAggregate job each over a primitive-array RDD cached once
  * (assignment against a k·dim TORRENT-BROADCAST long matrix via the same
  * argmin kernel the native [[graft.functions.ArgminCentroids]] expression
  * calls; per-task state k·(dim+1) longs, no shuffle, no per-round Catalyst
  * pass — r21, guide §1.2/§7.3), and the final assignment pass is a narrow
  * map with the expression (one plan node and one static call per row for
  * any k). Centroids (k·dim·8 bytes) are the ONLY driver-side state. SemDeDup pairs
  * only within a cluster — the paper's regime keeps k ∝ corpus size so
  * cluster populations (and the pair blowup) stay bounded; k is a parameter
  * here for exactly that reason.
  */
object Clustering {

  /** Quantization scale: milli-units. */
  val Quantum = 1000

  /** floor(x·1000 + 0.5) per element, as long — identical in any IEEE
    * float64 engine (DuckDB oracle: same expression over ::DOUBLE). */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * Quantum + lit(0.5)).cast("long"))

  /** The deterministic ordering Lloyd's init and the trainN sample draw
    * from. Default (`scatter = false`): smallest vec_ids — cheap, and on
    * naturally interleaved corpora the first k rows span the data. Scatter
    * (`scatter = true`): (md5(vec_id), vec_id) — a deterministic PSEUDO-
    * RANDOM permutation, so the init/sample is uniform over the corpus no
    * matter how ids are laid out. The failure mode it closes is measured in
    * the dossier (`graft.Stress embblk`): with BLOCK-CONTIGUOUS ids (all
    * copies of a direction adjacent — e.g. ids assigned per source shard)
    * the first-k init seeds every centroid from a handful of directions,
    * degrading SemDeDup recall and inflating within-cluster pair cost.
    * Same hash gate family as [[clusterSample]]'s member ranking; both
    * engines derive identical hex strings, so scatter lanes stay exactly
    * oracle-able (`ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id`). */
  private[operators] def initOrder(scatter: Boolean,
      idCol: String = "vec_id"): Seq[Column] =
    if (scatter)
      Seq(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    else Seq(col(idCol))

  /** The DuckDB text of [[initOrder]]. */
  private[operators] def initOrderSql(scatter: Boolean): String =
    if (scatter) "md5(CAST(vec_id AS VARCHAR)), vec_id" else "vec_id"

  /** argmin over centroids as struct(dist, cluster): smallest exact squared
    * L2 distance, then smallest cluster index — a total, engine-independent
    * order, evaluated by the native [[graft.functions.ArgminCentroids]]
    * expression over a BROADCAST centroid matrix. The plan carries one
    * expression node regardless of k (the r10 k-literal formulation grew
    * the plan and generated code linearly in k·dim — a structural blocker
    * at SemDeDup-regime k ~ 10^4-10^5, where it meant millions of plan
    * literals and codegen past the 64 KB method limit). */
  def assignStruct(qv: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ArgminCentroids(
        org.apache.spark.sql.graft.ColumnBridge.expression(qv), bc))

  /** Lloyd's iterations; returns the centroids after `iters` updates.
    * Init = the quantized vectors of the k first rows under [[initOrder]]
    * (smallest vec_ids by default; hash-scattered with `scatter`). Empty
    * clusters keep their previous centroid. `q` must have columns
    * (vec_id, qv). */
  def kmeansCentroids(q: DataFrame, k: Int, iters: Int): Array[Array[Long]] =
    kmeansCentroids(q, k, iters, scatter = false)

  def kmeansCentroids(q: DataFrame, k: Int, iters: Int,
      scatter: Boolean): Array[Array[Long]] = {
    val spark = q.sparkSession
    graft.functions.GraftFunctions.register(spark)
    var cents: Array[Array[Long]] = q.orderBy(initOrder(scatter): _*).limit(k)
      .select("qv").collect().map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"need at least $k vectors, got ${cents.length}")
    if (iters <= 0) return cents
    val dim = cents.head.length
    // Lloyd's rounds as ONE treeAggregate job each over a primitive-array
    // RDD materialized once (r21; guide §1.2 step 1, §7.3): the previous
    // per-round DataFrame aggregation re-entered Catalyst (analyze /
    // optimize / codegen) and ran a 2-stage shuffle per round, and on the
    // iterative lanes (c01-c07, IVF training) that driver-side planning
    // loop measured LARGER than all task time combined. The fold below is
    // the identical exact integer math — argminIdx is the same kernel the
    // ArgminCentroids expression calls (strict-improvement argmin, ties to
    // the smallest index), the per-cluster (Σqv, n) accumulators are plain
    // long additions (commutative — any partition order yields the same
    // sums), and the round-half-up update is unchanged — so the centroids
    // are bit-identical at every round. Per-task state is k·(dim+1) longs;
    // no shuffle, no per-round function registration, no plan growth.
    // NOTE (ADVICE r21): the dense zero value ships k·(dim+1) longs per
    // task — ~10-50 MB at SemDeDup-regime k ~ 10^4-10^5, dim 64, which is
    // inside a normal multi-GB-per-core executor budget but NOT free; a
    // huge-k regime that shows memory pressure here should switch the
    // accumulator to a sparse map of occupied clusters (the old
    // hash-aggregate path materialized only those).
    val vecs = q.select(col("qv")).queryExecution.toRdd
      .map(_.getArray(0).toLongArray())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sc = spark.sparkContext
      for (_ <- 1 to iters) {
        val bc = sc.broadcast(cents)
        val (sums, counts) = vecs.treeAggregate(
          (Array.ofDim[Long](k, dim), new Array[Long](k)))(
          seqOp = { case ((s, n), v) =>
            val best = graft.functions.CentroidKernels.argminIdx(v, bc.value)
            val row = s(best)
            val lim = math.min(dim, v.length)
            var i = 0
            while (i < lim) { row(i) += v(i); i += 1 }
            n(best) += 1
            (s, n)
          },
          combOp = { case ((s1, n1), (s2, n2)) =>
            var c = 0
            while (c < k) {
              val a = s1(c); val b = s2(c)
              var i = 0
              while (i < dim) { a(i) += b(i); i += 1 }
              n1(c) += n2(c)
              c += 1
            }
            (s1, n1)
          })
        bc.destroy()
        cents = cents.zipWithIndex.map { case (old, j) =>
          if (counts(j) == 0) old
          // round-half-up of the exact rational mean s/c, in integers
          else sums(j).map(si =>
            Math.floorDiv(2 * si + counts(j), 2 * counts(j)))
        }
      }
    } finally vecs.unpersist(blocking = false)
    cents
  }

  /** (vec_id, qv, cluster, dist) under the final centroids. The iteration
    * input is cached for the driver loop's actions, released before the lazy
    * result (built on a fresh scan) is returned — no pinned blocks escape.
    *
    * `trainN` bounds Lloyd's TRAINING to the trainN smallest vec_ids
    * (faiss-style, the same contract as [[Similarity.ivfKnn]]): the iters
    * driver-loop scans then touch only the sample — at 100 TB the
    * full-corpus alternative is iters+1 complete passes for a quantizer
    * whose quality saturates at ~256·k training points. The final
    * ASSIGNMENT pass always covers every vector, and the sort/limit sample
    * is deterministic in the ids, so the whole lane still carries an exact
    * DuckDB oracle (`kmeansSqlCtes(trainN = ...)`, lane c05). `None` (the
    * default) trains on the full corpus — the c01–c04 contract, unchanged.
    *
    * `scatter` switches the init (and, with `trainN`, the training sample)
    * to the hash-scattered ordering — see [[initOrder]] for when and why;
    * the scattered path is equally exact (oracle lane c06). */
  def assignments(emb: DataFrame, k: Int, iters: Int,
      trainN: Option[Int] = None, scatter: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val q0 = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val train = trainN.map(t => q0.sort(initOrder(scatter): _*).limit(t))
      .getOrElse(q0)
    val cached = train.persist(StorageLevel.MEMORY_AND_DISK)
    val cents =
      try kmeansCentroids(cached, k, iters, scatter)
      finally cached.unpersist(blocking = false)
    val bc = emb.sparkSession.sparkContext.broadcast(cents)
    q0.select(col("vec_id"), col("qv"),
        assignStruct(col("qv"), bc).as("a"))
      .select(col("vec_id"), col("qv"),
        col("a.cluster").as("cluster"), col("a.dist").as("dist"))
  }

  /** Per-cluster population cap for the SemDeDup pair join: clusters above
    * this split into ceil(pop/cap) hash sub-buckets before pairing, so no
    * task ever materializes more than ~cap² candidate pairs. The SemDeDup
    * regime keeps k ∝ corpus size precisely so populations stay bounded,
    * but an all-near-duplicate corpus collapses into one giant cluster
    * regardless of k — without a guard that is a silent quadratic blowup
    * (the same failure mode [[Dedup.capBuckets]] guards in LSH). Splitting
    * trades recall for the bound (near-dup pairs straddling two sub-buckets
    * of a split cluster are missed) — the flagged-and-documented tradeoff,
    * announced loudly on stderr when it engages. */
  val DefaultMaxClusterPop = 100000

  /** Adds the pair-join sub-bucket column: `sub` = xxhash64(vec_id) mod
    * ceil(pop/cap) for oversized clusters, 0 elsewhere. Deterministic in
    * the ids (hash of vec_id, never partitioning). The per-cluster sizes
    * are a k-row collect — bounded like every driver-side stat here. */
  private[graft] def subBucketed(asg: DataFrame, maxClusterPop: Int): DataFrame = {
    val sizes = asg.groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val over = sizes.filter(_._2 > maxClusterPop)
    if (over.isEmpty) asg.withColumn("sub", lit(0L))
    else {
      over.sortBy(_._1).foreach { case (c, n) =>
        System.err.println(s"[graft] SemDeDup cluster $c population $n " +
          s"exceeds cap $maxClusterPop: splitting into " +
          s"${(n + maxClusterPop - 1) / maxClusterPop} hash sub-buckets " +
          "(cross-sub-bucket duplicate pairs will be missed)")
      }
      val nsub = sizes.toSeq.map { case (c, n) =>
        (c, math.max(1L, (n + maxClusterPop - 1) / maxClusterPop))
      }
      val nsubDf = asg.sparkSession.createDataFrame(nsub).toDF("cluster", "nsub")
      asg.join(broadcast(nsubDf), Seq("cluster"))
        .withColumn("sub", pmod(xxhash64(col("vec_id")), col("nsub")))
        .drop("nsub")
    }
  }

  /** SemDeDup: duplicate pairs are same-cluster pairs whose quantized cosine
    * clears `tau`, resolved to components with min-id keepers. The cosine
    * gate is exact: dot > 0 ∧ dot² ≥ tau²·‖a‖²·‖b‖² — all longs below 2^53,
    * so the single double comparison is reproducible anywhere. Returns
    * (vec_id, cluster, rep, keep). The assignment cache (feeding both
    * self-join sides and the final left join) lands in `scope` — the
    * [[Dedup.CacheScope]] release contract, same as the dedup pipelines.
    * Clusters above `maxClusterPop` are hash-split before the pair join
    * (see [[DefaultMaxClusterPop]]). */
  def semanticDecisions(emb: DataFrame, k: Int, iters: Int, tau: Double,
      scope: Dedup.CacheScope = Dedup.CacheScope.unmanaged,
      maxClusterPop: Int = DefaultMaxClusterPop,
      trainN: Option[Int] = None, scatter: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // dot_long is the codegen'd exact kernel (one static call per candidate
    // pair) — the HOF zip_with/aggregate chain would allocate a zipped array
    // per pair evaluation on the quadratic within-cluster path
    val asg = scope.track(assignments(emb, k, iters, trainN, scatter)
      .withColumn("nsq", call_function("dot_long", col("qv"), col("qv")))
      .persist(StorageLevel.MEMORY_AND_DISK))
    // the sub-bucket column is a narrow decoration over the cached
    // assignments (plus one broadcast k-row join when a split engages)
    val asgSub = subBucketed(asg, maxClusterPop)
    val x = asgSub.as("x")
    val y = asgSub.as("y")
    val dot = call_function("dot_long", col("x.qv"), col("y.qv"))
    val pairs = x.join(y,
        col("x.cluster") === col("y.cluster") && col("x.sub") === col("y.sub") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        dot.as("dot"), (col("x.nsq") * col("y.nsq")).as("nn"))
      .filter(col("dot") > 0 &&
        (col("dot") * col("dot")).cast("double") >=
          lit(tau * tau) * col("nn").cast("double"))
      .select("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs, scope = scope)
      .withColumnRenamed("id", "vec_id")
      .withColumnRenamed("cluster", "rep")
    val out = asg.select(col("vec_id"), col("cluster"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("rep"), col("vec_id")).as("rep"))
      .withColumn("keep", col("rep") === col("vec_id"))
    out
  }

  /** Temperature-balanced resample: cluster quotas ∝ floor(sqrt(size))
    * (α = 0.5 flattens the head), members chosen by md5(vec_id) rank —
    * deterministic across engines and partitionings, like t25's hash gate.
    * Weights are INTEGER square roots so the quota split is exact rational
    * arithmetic (round-half-up via floorDiv) — a float Σ√n would make the
    * quota depend on the engine's summation order at .5 boundaries (e.g.
    * eight equal clusters with total=100 sit exactly on one). The
    * per-cluster rank is a [[TopKAggregate]] bounded fold (map-side
    * k-capped heaps), never a per-cluster window sort. The size collect
    * uses a transient cache released before return; the lazy result
    * recomputes the (narrow) assignment map once when materialized — no
    * pinned blocks escape. */
  def clusterSample(emb: DataFrame, k: Int, iters: Int, total: Int,
      trainN: Option[Int] = None, scatter: Boolean = false): DataFrame = {
    val spark = emb.sparkSession
    val asg = assignments(emb, k, iters, trainN, scatter)
      .select("vec_id", "cluster")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = asg.groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side quota math over k clusters, all integers
    val wts = (0L until k.toLong).map(j =>
      math.floor(math.sqrt(sizes.getOrElse(j, 0L).toDouble)).toLong)
    val tw = wts.sum
    val quotas = (0 until k).map { j =>
      val n = sizes.getOrElse(j.toLong, 0L)
      val q = if (tw == 0) 0L
        else Math.floorDiv(2L * total * wts(j) + tw, 2L * tw)
      j.toLong -> math.min(n, q)
    }
    val quotaDf = spark.createDataFrame(quotas.map(q => (q._1, q._2)))
      .toDF("cluster", "quota")
    TopKAggregate.register(spark, k = total, desc = Seq(false, false),
      name = "cluster_topk")
    val ranked = asg
      .withColumn("h", md5(col("vec_id").cast("string").cast("binary")))
      .groupBy("cluster")
      .agg(TopKAggregate.topK("cluster_topk",
        struct(col("h"), col("vec_id"))).as("top"))
      .select(col("cluster"), posexplode(col("top")))
      .select(col("cluster"), (col("pos") + 1).as("rank"),
        col("col.vec_id").as("vec_id"))
    val out = ranked.join(broadcast(quotaDf), Seq("cluster"))
      .filter(col("rank") <= col("quota"))
      .select("vec_id", "cluster")
    asg.unpersist(blocking = false)
    out
  }

  /** Outlier flags per vector: dist − μ_cluster > 2σ_cluster, decided in
    * EXACT integer arithmetic so every engine agrees on boundary cases.
    * With n, Σd, Σd² per cluster (d the exact squared quantized distance):
    *
    *   d − μ > 2σ  ⇔  n·d − Σd > 0  ∧  (n·d − Σd)² > 4·(n·Σd² − (Σd)²)
    *
    * — both sides integers (decimal(38,0) here, HUGEINT in the oracle;
    * magnitudes stay ≤ ~1e23). Plan shape: one k-row aggregate broadcast
    * back onto the assignment scan; the k-means driver loop runs once
    * (centroids are literals in both branches). */
  def centroidOutliers(emb: DataFrame, k: Int, iters: Int,
      trainN: Option[Int] = None, scatter: Boolean = false): DataFrame = {
    val asg = assignments(emb, k, iters, trainN, scatter)
      .select("vec_id", "cluster", "dist")
    val d = col("dist").cast("decimal(38,0)")
    val stats = asg.groupBy("cluster").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(d).cast("decimal(38,0)").as("sd"),
      sum(d * d).cast("decimal(38,0)").as("sdd"))
    asg.join(broadcast(stats), Seq("cluster"))
      .withColumn("nd", col("n") * d - col("sd"))
      .withColumn("outlier", col("nd") > 0 &&
        col("nd") * col("nd") >
          lit(4) * (col("n") * col("sdd") - col("sd") * col("sd")))
      .select(col("vec_id"), col("cluster"), col("dist"), col("outlier"))
  }

  // ---------------- DuckDB oracle: the same k-means, unrolled ----------------

  /** CTE block re-deriving the k-means assignment in pure DuckDB SQL:
    * quantize → init from the k smallest vec_ids → `iters` unrolled rounds of
    * (argmin assign, exact integer centroid update, empty-cluster coalesce) →
    * final assignment `asg(vec_id, v, cid, dist)`. Long arithmetic throughout;
    * floor((2s+c)/(2.0·c)) is exact here because numerator and denominator
    * are exact doubles and the true rational is ≥ 1/(2c) from any other
    * integer — far outside one ulp. */
  def kmeansSqlCtes(k: Int, iters: Int, dim: Int): String =
    kmeansSqlCtes(k, iters, dim, trainN = None)

  /** As above, but with `trainN` set the Lloyd's rounds train on only the
    * `trainN` smallest vec_ids (CTE `samp`) while the final `asg` still
    * assigns EVERY vector — re-deriving [[Similarity.ivfKnn]]'s
    * sample-bounded quantizer training. `trainN = None` generates the
    * exact full-corpus text the c01–c04 oracles embed. */
  def kmeansSqlCtes(k: Int, iters: Int, dim: Int, trainN: Option[Int]): String =
    kmeansSqlCtes(k, iters, dim, trainN, scatter = false)

  /** As above with `scatter`: the training sample and init order by
    * (md5(vec_id), vec_id) — re-deriving [[initOrder]]'s hash-scattered
    * permutation in SQL (lane c06). */
  def kmeansSqlCtes(k: Int, iters: Int, dim: Int, trainN: Option[Int],
      scatter: Boolean): String = {
    val src = if (trainN.isDefined) "samp" else "q"
    val ord = initOrderSql(scatter)
    val sampCte = trainN.map(t =>
      s"""samp AS (SELECT vec_id, v FROM q ORDER BY $ord LIMIT $t),
         |""".stripMargin).getOrElse("")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(x::DOUBLE * $Quantum + 0.5) AS BIGINT)) AS v
       |  FROM embeddings),
       |$sampCte${lloydCtes("", src, k, iters, dim, ord)},
       |${lloydAssignCte("asg", "q", s"c$iters")}""".stripMargin
  }

  private def lloydDistSql(c: String): String =
    s"CAST(list_sum(list_transform(list_zip(p.v, $c.m), " +
      "z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT)"

  /** One unrolled Lloyd's assignment CTE: every row of `from(vec_id, v)`
    * labeled with its nearest centroid in `cents(cid, m)` — exact long
    * distance, (dist, cid) ties. Shared by the k-means oracles (c01–c04,
    * v06) and the PQ per-subspace training/encoding (v07), so the
    * assignment kernel can never silently diverge between them.
    * `materialized` emits AS MATERIALIZED — needed where the CTE feeds a
    * deep multiply-referenced graph (v10): DuckDB 1.0 INLINES every CTE
    * reference, so an unmaterialized shared assignment re-evaluates its
    * whole training chain per reference, multiplicatively. */
  private[operators] def lloydAssignCte(name: String, from: String,
      cents: String, materialized: Boolean = false): String =
    s"""$name AS ${if (materialized) "MATERIALIZED " else ""}(
       |  SELECT vec_id, v, cid, dist FROM (
       |    SELECT p.vec_id, p.v, c.cid, ${lloydDistSql("c")} AS dist,
       |      row_number() OVER (PARTITION BY p.vec_id
       |        ORDER BY ${lloydDistSql("c")}, c.cid) AS rn
       |    FROM $from p CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin

  /** The unrolled integer Lloyd's: init `${prefix}c0` from the k smallest
    * vec_ids of `src(vec_id, v)`, then `iters` rounds of (assign, exact
    * integer sum, round-half-up update, empty-cluster coalesce). The final
    * codebook CTE is `${prefix}c$iters`. One generator for every oracle
    * that trains k-means — full-corpus (kmeansSqlCtes, prefix "") and
    * per-subspace PQ (pqCtes, prefix "s<i>"). `initOrd` is the init
    * ordering text ([[initOrderSql]]). */
  private[operators] def lloydCtes(prefix: String, src: String, k: Int,
      iters: Int, dim: Int, initOrd: String = "vec_id"): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"${prefix}c${i - 1}"
      s"""${lloydAssignCte(s"${prefix}a$i", src, prev)},
         |${prefix}s$i AS (
         |  SELECT cid, pos, sum(v[pos]) AS s, count(*) AS c
         |  FROM ${prefix}a$i CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS pos)
         |  GROUP BY 1, 2),
         |${prefix}n$i AS (
         |  SELECT cid, list(CAST(floor((2*s + c) / (2.0*c)) AS BIGINT)
         |    ORDER BY pos) AS m
         |  FROM ${prefix}s$i GROUP BY 1),
         |${prefix}c$i AS (
         |  SELECT $prev.cid, coalesce(${prefix}n$i.m, $prev.m) AS m
         |  FROM $prev LEFT JOIN ${prefix}n$i USING (cid))""".stripMargin
    }
    val init =
      s"""${prefix}c0 AS (
         |  SELECT row_number() OVER (ORDER BY $initOrd) - 1 AS cid, v AS m
         |  FROM (SELECT vec_id, v FROM $src ORDER BY $initOrd LIMIT $k))""".stripMargin
    // iters = 0 (assignment under the raw init, a case the Spark side
    // supports) must not leave a dangling comma after the init CTE
    (init +: rounds).mkString(",\n")
  }

  // ---------------- registered queries ----------------

  private val K = 8
  private val Iters = 3
  private val Tau = 0.35
  private val SampleTotal = 100
  /** c05's training bound — below the embeddings row count at every test SF
    * (500 at sf0.01, 2000 at sf0.1), so the sampled path is genuinely
    * exercised, never trivially equal to full-corpus training. */
  private val TrainBound = 256

  val queries: Seq[Q] = Seq(
    // ---- deterministic k-means over the embedding table: cluster id and
    // exact integer distance per vector. The oracle re-runs the identical
    // integer Lloyd's, unrolled into SQL ----
    Q("c01_kmeans", (s, dir) => {
      assignments(t(s, dir, "embeddings"), K, Iters)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          col("dist").cast("long").as("dist"))
        .orderBy("vec_id")
    }, Some(
      s"""${kmeansSqlCtes(K, Iters, 64)}
         |SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |  CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist
         |FROM asg ORDER BY 1""".stripMargin), bench = true),

    // ---- SemDeDup: within-cluster cosine-duplicate components, min-id
    // keepers. Oracle: k-means CTEs + exact integer cosine gate + the t13
    // recursive transitive closure ----
    Q("c02_semantic_dedup", (s, dir) => {
      semanticDecisions(t(s, dir, "embeddings"), K, Iters, Tau)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          col("rep").cast("long").as("rep"), col("keep"))
        .orderBy("vec_id")
    }, Some(
      s"""${kmeansSqlCtes(K, Iters, 64).replaceFirst("WITH q AS", "WITH RECURSIVE q AS")},
         |norms AS (
         |  SELECT vec_id, cid, v,
         |    CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT) AS nsq
         |  FROM asg),
         |prs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CAST(list_sum(list_transform(list_zip(a.v, b.v),
         |      z -> z[1]*z[2])) AS BIGINT) AS dot,
         |    a.nsq * b.nsq AS nn
         |  FROM norms a JOIN norms b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT id_a, id_b FROM prs
         |  -- tau^2 as an IEEE double PRODUCT, matching Scala's tau*tau —
         |  -- a bare 0.35*0.35 literal is DECIMAL math in DuckDB (exactly
         |  -- 0.1225, one ulp off the double product) and would disagree
         |  -- with Spark on pairs landing in that gap
         |  WHERE dot > 0 AND
         |    (dot*dot)::DOUBLE >= ($Tau::DOUBLE * $Tau::DOUBLE) * nn::DOUBLE),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk AS (
         |  SELECT src AS id, src AS reach FROM edges
         |  UNION
         |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
         |reps AS (
         |  SELECT id, min(reach) AS rep FROM walk GROUP BY 1)
         |SELECT CAST(n.vec_id AS BIGINT) AS vec_id,
         |  CAST(n.cid AS BIGINT) AS cluster,
         |  CAST(coalesce(r.rep, n.vec_id) AS BIGINT) AS rep,
         |  coalesce(r.rep, n.vec_id) = n.vec_id AS keep
         |FROM norms n LEFT JOIN reps r ON r.id = n.vec_id
         |ORDER BY 1""".stripMargin), bench = true),

    // ---- temperature-balanced cluster sample: quotas ∝ floor(sqrt(size)),
    // members by md5 rank ----
    Q("c03_cluster_sample", (s, dir) => {
      clusterSample(t(s, dir, "embeddings"), K, Iters, SampleTotal)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"))
        .orderBy("vec_id")
    }, Some(
      s"""${kmeansSqlCtes(K, Iters, 64)},
         |sz AS (SELECT cid, count(*) AS n FROM asg GROUP BY 1),
         |-- integer sqrt weights: the quota split is exact rational
         |-- arithmetic (round-half-up), immune to float summation order
         |w AS (SELECT cid, n,
         |  CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS wt FROM sz),
         |tw AS (SELECT sum(wt) AS tw FROM w),
         |quota AS (
         |  SELECT cid, least(n, CAST(
         |    floor((2*$SampleTotal*wt + tw) / (2.0*tw)) AS BIGINT)) AS q
         |  FROM w, tw),
         |ranked AS (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY cid
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |  FROM asg)
         |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cluster
         |FROM ranked JOIN quota USING (cid)
         |WHERE rn <= q ORDER BY 1""".stripMargin), bench = true),

    // ---- embedding-space outlier pruning: flag vectors farther than
    // mean + 2*stddev from their cluster centroid — the noise-removal
    // step of embedding curation. The gate is EXACT integer arithmetic
    // (d − μ > 2σ  ⇔  n·d − Σd > 0 ∧ (n·d − Σd)² > 4·(n·Σd² − (Σd)²)),
    // evaluated in decimal(38,0) on the Spark side and HUGEINT in DuckDB
    // (all magnitudes ≤ ~1e23 « 1e38). Per-cluster stats are a k-row agg
    // broadcast back onto the scan: no window, no per-cluster sort, and
    // the only shuffle is the k-row partial agg ----
    Q("c04_centroid_outliers", (s, dir) => {
      centroidOutliers(t(s, dir, "embeddings"), K, Iters)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          col("dist").cast("long").as("dist"), col("outlier"))
        .orderBy("vec_id")
    }, Some(
      s"""${kmeansSqlCtes(K, Iters, 64)},
         |st AS (
         |  SELECT cid, CAST(count(*) AS HUGEINT) AS n,
         |    sum(CAST(dist AS HUGEINT)) AS sd,
         |    sum(CAST(dist AS HUGEINT) * CAST(dist AS HUGEINT)) AS sdd
         |  FROM asg GROUP BY 1
         |)
         |SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
         |  CAST(a.cid AS BIGINT) AS cluster,
         |  CAST(a.dist AS BIGINT) AS dist,
         |  (st.n * a.dist - st.sd) > 0 AND
         |    (st.n * a.dist - st.sd) * (st.n * a.dist - st.sd)
         |      > 4 * (st.n * st.sdd - st.sd * st.sd) AS outlier
         |FROM asg a JOIN st ON st.cid = a.cid
         |ORDER BY 1""".stripMargin), bench = true),

    // ---- sample-bounded quantizer training: Lloyd's trains on the
    // TrainBound smallest vec_ids only (the 100 TB regime — iters full
    // corpus passes for a quantizer is the wrong plan when quality
    // saturates at ~256·k training points), the assignment pass still
    // covers every vector. Oracle: the same unrolled integer Lloyd's with
    // its training CTE LIMITed to the identical deterministic sample ----
    Q("c05_kmeans_sampled", (s, dir) => {
      assignments(t(s, dir, "embeddings"), K, Iters, trainN = Some(TrainBound))
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          col("dist").cast("long").as("dist"))
        .orderBy("vec_id")
    }, Some(
      s"""${kmeansSqlCtes(K, Iters, 64, trainN = Some(TrainBound))}
         |SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |  CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist
         |FROM asg ORDER BY 1""".stripMargin)),

    // ---- hash-scattered init + training sample: the Lloyd's init and the
    // trainN sample draw from the (md5(vec_id), vec_id) permutation instead
    // of the smallest ids — immune to block-contiguous id layouts that
    // collapse the first-k init onto a few near-duplicate directions (the
    // dossier's measured adversarial case). Still exactly oracle-able:
    // DuckDB derives the identical hex ordering ----
    Q("c06_kmeans_scatter", (s, dir) => {
      assignments(t(s, dir, "embeddings"), K, Iters,
          trainN = Some(TrainBound), scatter = true)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          col("dist").cast("long").as("dist"))
        .orderBy("vec_id")
    }, Some(
      s"""${kmeansSqlCtes(K, Iters, 64, trainN = Some(TrainBound), scatter = true)}
         |SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |  CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist
         |FROM asg ORDER BY 1""".stripMargin)),

    // ---- SemDeDup at serving-scale k (r11 verdict ask): the c-lanes run
    // k=8 while the broadcast-argmin expression was built for k~10^3-10^5,
    // so the claimed k-scaling had only a plan-size assert, never a bench
    // clock. k=1024 here; since init needs k vectors at every SF, the
    // corpus is each embedding row split into its 4 disjoint 16-dim
    // slices (vec_id*4+j — deterministic, SQL-re-derivable): 2000 vectors
    // at sf0.01, 8000 at sf0.1. One Lloyd's round (the oracle unrolls
    // k*n assignment pairs in SQL — bounded, not free) + the c02 SemDeDup
    // tail; the sub-bucket cap path stays armed, and at ~2-8 members per
    // cluster the pair join is tiny — the measured cost IS the k=1024
    // argmin scan, which is the point ----
    Q("c07_semantic_dedup_k1024", (s, dir) => {
      val expanded = t(s, dir, "embeddings")
        .select(explode(array((0 until 4).map(j =>
            struct((col("vec_id") * 4 + j).as("vec_id"),
              slice(col("embedding"), j * 16 + 1, 16).as("embedding"))): _*))
          .as("e"))
        .select(col("e.vec_id").as("vec_id"), col("e.embedding").as("embedding"))
      semanticDecisions(expanded, 1024, 1, Tau)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          col("rep").cast("long").as("rep"), col("keep"))
        .orderBy("vec_id")
    }, Some(
      s"""WITH RECURSIVE q AS (
         |  SELECT e.vec_id * 4 + j AS vec_id, list_transform(
         |    e.embedding[16*j+1 : 16*j+16],
         |    x -> CAST(floor(x::DOUBLE * $Quantum + 0.5) AS BIGINT)) AS v
         |  FROM embeddings e CROSS JOIN range(4) r(j)),
         |${lloydCtes("", "q", 1024, 1, 16)},
         |${lloydAssignCte("asg", "q", "c1", materialized = true)},
         |norms AS (
         |  SELECT vec_id, cid, v,
         |    CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT) AS nsq
         |  FROM asg),
         |prs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CAST(list_sum(list_transform(list_zip(a.v, b.v),
         |      z -> z[1]*z[2])) AS BIGINT) AS dot,
         |    a.nsq * b.nsq AS nn
         |  FROM norms a JOIN norms b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT id_a, id_b FROM prs
         |  WHERE dot > 0 AND
         |    (dot*dot)::DOUBLE >= ($Tau::DOUBLE * $Tau::DOUBLE) * nn::DOUBLE),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk AS (
         |  SELECT src AS id, src AS reach FROM edges
         |  UNION
         |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
         |reps AS (
         |  SELECT id, min(reach) AS rep FROM walk GROUP BY 1)
         |SELECT CAST(n.vec_id AS BIGINT) AS vec_id,
         |  CAST(n.cid AS BIGINT) AS cluster,
         |  CAST(coalesce(r.rep, n.vec_id) AS BIGINT) AS rep,
         |  coalesce(r.rep, n.vec_id) = n.vec_id AS keep
         |FROM norms n LEFT JOIN reps r ON r.id = n.vec_id
         |ORDER BY 1""".stripMargin), bench = true)
  )
}
