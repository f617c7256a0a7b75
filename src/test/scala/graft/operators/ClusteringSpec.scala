package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionTestWrapper
import graft.functions.VectorSumAggregate

/** Embedding-curation kernels: exact vector-sum aggregation, planted-cluster
  * recovery, SemDeDup grouping, quota sampling, and the determinism the
  * DuckDB oracles rely on. */
class ClusteringSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dim = 64

  /** A float32 blob near `center` with SIGNED per-coordinate jitter in
    * [-0.048, 0.048] from a fixed LCG — deterministic, no Random. Signed
    * matters: zero-centered blobs then have genuinely random directions
    * (positive-only jitter would put every vector in the positive orthant,
    * where pairwise cosines concentrate near +0.75, not 0). */
  private def blob(center: Float, id: Long): Array[Float] = {
    var s = id * 6364136223846793005L + 1442695040888963407L
    Array.tabulate(dim) { i =>
      s = s * 6364136223846793005L + 1442695040888963407L
      center + ((s >>> 40).toInt % 97 - 48) / 1000f
    }
  }

  private def embDf(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("vec_sum equals a per-group naive elementwise sum (fuzz over splits)") {
    import spark.implicits._
    VectorSumAggregate.register(spark, dim = 4)
    val rows = (0L until 400L).map { i =>
      (i % 7, Array(i, i * i % 31, -i, (i % 5) - 2))
    }
    val got = rows.toDF("g", "v").repartition(8)
      .groupBy("g").agg(VectorSumAggregate.vecSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2.toVector).reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
    }
    assert(got == want)
  }

  test("k-means recovers three planted well-separated blobs") {
    // 3 blobs at centers -2, 0, +2; jitter ±0.1 — inter-blob distance
    // dwarfs intra-blob spread, so Lloyd's must converge to the planting
    val rows = (0L until 90L).map { i =>
      val c = (i % 3).toInt // interleaved so the first-k init spans blobs
      (i, blob(Array(-2f, 0f, 2f)(c), i))
    }
    val asg = Clustering.assignments(embDf(rows), k = 3, iters = 4)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member of a planted blob landed in the same k-means cluster
    (0 until 3).foreach { c =>
      val labels = rows.collect { case (id, _) if id % 3 == c => asg(id) }.toSet
      assert(labels.size == 1, s"blob $c split across clusters $labels")
    }
    // and the three blobs landed in three DIFFERENT clusters
    assert((0 until 3).map(c => asg(c.toLong)).toSet.size == 3)
  }

  test("empty clusters keep their previous centroid (no crash, k survives)") {
    // two tight blobs but k = 4: at least two clusters end up empty
    val rows = (0L until 40L).map(i => (i, blob(if (i % 2 == 0) -1f else 1f, i)))
    val asg = Clustering.assignments(embDf(rows), k = 4, iters = 3)
      .select("vec_id", "cluster").collect()
    assert(asg.length == 40)
    assert(asg.map(_.getLong(1)).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
  }

  test("semantic dedup groups planted duplicates under the min id and " +
    "releases its caches via the scope") {
    // base corpus of zero-centered signed-jitter vectors — random
    // directions, pairwise cosine concentrating near 0 (σ ≈ 1/8), far
    // from τ = 0.95 (nonzero-center blobs would all be near-parallel and
    // τ would catch everything) — plus one dup group: ids 100/101 share a
    // vector exactly, 102 is a near-copy (cos ≈ 1)
    val shared = blob(1.5f, 7L)
    val near = shared.clone(); near(0) = near(0) + 0.01f
    val rows = (0L until 30L).map(i => (i, blob(0f, i))) ++
      Seq((100L, shared), (101L, shared), (102L, near))
    // snapshot, not global emptiness: suites sharing this session leave
    // their own deliberately-unmanaged caches behind (suite order varies
    // between `test` and `testOnly` selections)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new Dedup.CacheScope
    val dec = Clustering.semanticDecisions(embDf(rows), k = 3, iters = 3,
      tau = 0.95, scope = scope)
      .select("vec_id", "rep", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = dec.map(d => d._1 -> d).toMap
    assert(byId(100L) == ((100L, 100L, true)))
    assert(byId(101L) == ((101L, 100L, false)))
    assert(byId(102L) == ((102L, 100L, false)))
    // vectors in distinct regions all survive
    assert(dec.count(!_._3) == 2)
    scope.release()
    // give the async unpersists a beat, then require no pinned blocks of
    // our own beyond the pre-existing snapshot
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    val deadline = System.currentTimeMillis() + 10000
    while (leaked().nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(leaked().isEmpty, s"leaked caches: ${leaked()}")
  }

  test("cluster sample honors sqrt-size quotas and is deterministic") {
    // sizes 81/28/11, with ids 0/1/2 one per blob so the first-k init
    // spans the planting (Lloyd's then converges to it immediately)
    val rows = (0L until 120L).map { i =>
      val c = if (i < 3) i.toInt else if (i < 83) 0 else if (i < 110) 1 else 2
      (i, blob(Array(-2f, 0f, 2f)(c), i))
    }
    def run() = Clustering.clusterSample(embDf(rows), k = 3, iters = 3,
      total = 30).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val got = run()
    // quotas: round-half-up of total·w/Σw with integer weights w = ⌊√n⌋
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    val wts = Seq(81L, 28L, 11L).map(n => math.sqrt(n.toDouble).toLong)
    val tw = wts.sum
    val expected = wts.map(w => Math.floorDiv(2L * 30 * w + tw, 2L * tw).toInt)
    assert(sizes.values.toSeq.sorted == expected.sorted,
      s"per-cluster counts $sizes vs expected $expected")
    assert(got.length == expected.sum)
    assert(run().sameElements(got), "resample must be deterministic")
  }

  test("assignments are deterministic across runs and partitionings") {
    val rows = (0L until 60L).map(i => (i, blob((i % 4).toFloat, i)))
    def run(parts: Int) =
      Clustering.assignments(embDf(rows).repartition(parts), k = 4, iters = 3)
        .select("vec_id", "cluster", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(2) == run(7))
  }

  test("centroid outliers: planted far point flagged, tight blob members not") {
    // two tight blobs + one point far from its nearest centroid: with the
    // planted point included in the stats, d_far − μ ≈ d_far·(1−1/n) while
    // 2σ ≈ 2·d_far·√(n−1)/n, so the gate fires for n ≥ ~6
    val far = Array.tabulate(dim)(i => if (i == 0) 40f else 0f)
    val rows = (0L until 60L).map { i =>
      (i, blob(Array(-2f, 2f)((i % 2).toInt), i))
    } :+ (60L, far)
    val got = Clustering.centroidOutliers(embDf(rows), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(60L), "planted far point must be flagged")
    // a 2σ gate legitimately flags the extreme ~2% tail inside a tight
    // blob too — require the planted point plus at most a small tail
    val tightFlagged = (0L until 60L).count(got(_))
    assert(tightFlagged <= 4, s"too many tight members flagged: $tightFlagged")
  }

  test("argmin kernel matches a naive min-by (fuzz incl. exact ties)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    var s = 99L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    for (trial <- 0 until 50) {
      val d = 1 + (trial % 7)
      val k = 1 + (trial % 19)
      val cents = Array.fill(k)(Array.fill(d)(nxt() % 7))
      // force exact ties regularly: duplicate an earlier centroid
      if (k > 2 && trial % 3 == 0) cents(k - 1) = cents(trial % (k - 1)).clone()
      val qv = Array.fill(d)(nxt() % 7)
      val got = graft.functions.CentroidKernels.argmin(
        new GenericArrayData(qv), cents)
      val want = cents.zipWithIndex.map { case (m, j) =>
        (m.zip(qv).map { case (a, b) => (b - a) * (b - a) }.sum, j.toLong)
      }.min
      assert((got.getLong(0), got.getLong(1)) == want, s"trial $trial")
    }
    // nearest-n probe list: full ordering by (dist, cid)
    val cents = Array(Array(0L, 0L), Array(10L, 0L), Array(0L, 0L), Array(3L, 4L))
    val near = graft.functions.CentroidKernels.nearest(
      new GenericArrayData(Array(1L, 1L)), cents, 3)
    // dists: c0=2, c1=82, c2=2, c3=13 -> order (2,c0),(2,c2),(13,c3)
    assert(near.toLongArray().toSeq == Seq(0L, 2L, 3L))
  }

  test("assignment plan is constant-size in k and stays codegen'd at k=512") {
    val rows = (0L until 600L).map(i => (i, blob((i % 4).toFloat, i)))
    def optimized(k: Int) =
      Clustering.assignments(embDf(rows), k = k, iters = 0)
        .queryExecution.optimizedPlan
    def exprNodes(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.map(e => { var n = 0; e.foreach(_ => n += 1); n }).sum
    val small = exprNodes(optimized(4))
    val large = exprNodes(optimized(512))
    // the r10 k-literal argmin grew the plan by ~k·dim literal nodes; the
    // broadcast-matrix expression must not grow AT ALL
    assert(large == small,
      s"plan expression count grew with k: $small (k=4) vs $large (k=512)")
    // and the generated code must compile, not fall back to interpretation
    // (k-literals blew past the 64 KB method limit at large k)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val asg = Clustering.assignments(embDf(rows), k = 512, iters = 0)
        .select("vec_id", "cluster", "dist").collect()
      assert(asg.length == 600)
      // 600 distinct-ish vectors, k=512, init = first 512 vec_ids: the
      // init members must each sit at distance 0 from their own centroid
      val byId = asg.map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert((0L until 512L).forall(byId(_) == 0L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("sample-bounded training: trainN >= population is byte-identical to " +
    "full-corpus; a genuine bound trains on exactly the first-N ids") {
    val rows = (0L until 100L).map(i => (i, blob((i % 4).toFloat, i)))
    val df = embDf(rows)
    def dump(asg: org.apache.spark.sql.DataFrame) =
      asg.select("vec_id", "cluster", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val full = dump(Clustering.assignments(df, k = 4, iters = 3))
    val uncapped = dump(Clustering.assignments(df, k = 4, iters = 3,
      trainN = Some(1000)))
    assert(uncapped == full, "trainN above the population must be a no-op")
    // bounded path: re-derive driver-side — quantize, train Lloyd's on the
    // 40 smallest ids via the public kmeansCentroids, assign every vector
    // with a naive argmin — and require exact agreement
    val got = dump(Clustering.assignments(df, k = 4, iters = 3,
      trainN = Some(40)))
    assert(got.map(_._1) == rows.map(_._1),
      "bounded training must still assign EVERY vector")
    val q0 = df.select(col("vec_id"), Clustering.quantize(col("embedding")).as("qv"))
    val cents = Clustering.kmeansCentroids(q0.sort("vec_id").limit(40), 4, 3)
    val want = rows.map { case (id, v) =>
      val qv = v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
      val (d, c) = cents.zipWithIndex.map { case (m, j) =>
        (m.zip(qv).map { case (a, b) => (b - a) * (b - a) }.sum, j.toLong)
      }.min
      (id, c, d)
    }
    assert(got == want)
    assert(got != full,
      "the 40-id bound must actually change the centroids on this data")
  }

  test("scatter init equals first-k init over hash-rank-relabelled ids") {
    // scatter = init (and sample) drawn from the (md5(vec_id), vec_id)
    // permutation. Relabelling every vec_id by its hash RANK turns that
    // permutation into the plain id order, so kmeansCentroids(scatter)
    // on the original ids must emit byte-identical centroids to
    // kmeansCentroids(first) on the relabelled frame — pinning the exact
    // ordering the c06 oracle re-derives in SQL
    import spark.implicits._
    val rows = (0L until 90L).map(i => (i, blob((i % 5).toFloat - 2f, i)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val rank = rows.map(_._1).sortBy(id => (hex(id), id)).zipWithIndex.toMap
    val q = embDf(rows).select(col("vec_id"),
      Clustering.quantize(col("embedding")).as("qv"))
    val relabelled = rows.map { case (id, v) => (rank(id).toLong, v) }
    val qRel = embDf(relabelled).select(col("vec_id"),
      Clustering.quantize(col("embedding")).as("qv"))
    val got = Clustering.kmeansCentroids(q, k = 6, iters = 2, scatter = true)
    val want = Clustering.kmeansCentroids(qRel, k = 6, iters = 2)
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("scatter init recovers a block-contiguous planting the first-k init " +
    "degrades on") {
    // 50 well-separated directions x 20 BLOCK-CONTIGUOUS copies (all copies
    // of a direction adjacent in id space — the per-source-shard layout).
    // First-k init sees only directions 0-2; scatter draws a pseudo-random
    // 50 of the 1000 ids. SemDeDup should keep ~1 representative per
    // direction; count how many extra duplicates each init leaves behind.
    val dirs = 50
    val copies = 20
    val rows = (0L until (dirs * copies).toLong).map { id =>
      val d = (id / copies).toInt
      // distinct direction per d: a signed jittered blob around a
      // direction-specific center pattern (blob() already varies per id;
      // vary the center per direction so directions are well separated)
      var s = d.toLong * 2862933555777941757L + 3037000493L
      val center = Array.tabulate(dim) { _ =>
        s = s * 2862933555777941757L + 3037000493L
        ((s >>> 40).toInt % 2001 - 1000) / 1000f
      }
      var t = id * 6364136223846793005L + 1442695040888963407L
      (id, center.map { x =>
        t = t * 6364136223846793005L + 1442695040888963407L
        x + ((t >>> 40).toInt % 5 - 2) / 1000f
      })
    }
    def keepers(scatter: Boolean): Long = {
      val scope = new Dedup.CacheScope
      try Clustering.semanticDecisions(embDf(rows), k = dirs, iters = 3,
          tau = 0.95, scope = scope, scatter = scatter)
        .filter(col("keep")).count()
      finally scope.release()
    }
    val first = keepers(scatter = false)
    val scat = keepers(scatter = true)
    info(s"keepers: first-k $first, scatter $scat (ideal $dirs)")
    // ideal = 50 keepers; every keeper beyond that is a missed duplicate.
    // At k == dirs exactly the 50 scattered draws cover ~32 distinct
    // directions (coupon collector), so a small split tail remains — the
    // property under test is the strict, large improvement over the
    // collapsed first-k init, not perfection at the tightest possible k
    assert(scat >= dirs, s"over-merged: $scat")
    assert(scat < first,
      s"scatter ($scat keepers) must strictly beat first-k ($first) here")
    assert(scat <= dirs + 10, s"scatter left too many duplicates: $scat")
  }

  test("kmeansSqlCtes emits well-formed SQL at iters = 0 (no dangling comma)") {
    // iters = 0 (assignment under the raw init) is a supported Spark-side
    // case; the generator used to leave ",\n," between the init CTE and
    // the assignment CTE, which DuckDB rejects
    for (trainN <- Seq(None, Some(16)); scatter <- Seq(false, true)) {
      val sql = Clustering.kmeansSqlCtes(4, 0, 8, trainN, scatter)
      assert(!sql.contains(",\n,"), s"dangling comma (trainN=$trainN):\n$sql")
      assert(sql.contains("c0 AS") && sql.contains("asg AS"))
      assert(!sql.contains("c1 AS"), "iters=0 must not emit round CTEs")
      assert(sql.contains("md5(CAST(vec_id AS VARCHAR))") == scatter,
        s"scatter=$scatter ordering missing/spurious:\n$sql")
    }
  }

  test("centroid outlier gate matches an exact BigInt recomputation") {
    val rows = (0L until 80L).map(i => (i, blob((i % 3).toFloat - 1f, i)))
    val df = embDf(rows)
    val asg = Clustering.assignments(df, k = 3, iters = 3)
      .select("vec_id", "cluster", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent rule evaluation in BigInt (no decimal/HUGEINT involved)
    val byC = asg.groupBy(_._2)
    val want = asg.map { case (id, c, d) =>
      val ds = byC(c).map(_._3)
      val n = BigInt(ds.length); val sd = ds.map(BigInt(_)).sum
      val sdd = ds.map(x => BigInt(x) * BigInt(x)).sum
      val nd = n * d - sd
      id -> (nd > 0 && nd * nd > 4 * (n * sdd - sd * sd))
    }.toMap
    val got = Clustering.centroidOutliers(df, k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == want)
  }
}
