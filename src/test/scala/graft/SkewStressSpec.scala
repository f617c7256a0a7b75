package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.index.{IndexParams, MinimizerIndex}
import graft.taxa.Taxonomy

/** Adversarial-skew stress for the two 100x-scale claims that are otherwise
  * only design-argued: the (optionally salted) LCA index fold under a
  * minimizer holding ~30% of all records, and MinHash-LSH candidate
  * generation under a boilerplate block shared by 50% of the corpus (an
  * uncapped bucket would pair quadratically: 16 bands x 2.5k^2 pairs).
  * Both runs record real Spark task metrics through a listener and assert
  * that no task dominates its stage — the empirical form of "this plan
  * survives a skewed key at scale". Volumes match the sf0.1 driver bench
  * (~2M library bases / 5k docs). */
class SkewStressSpec extends AnyFunSuite with SparkSessionTestWrapper {

  /** Collects successful task durations per stage. */
  private final class TaskStatsListener extends SparkListener {
    private val byStage =
      new java.util.concurrent.ConcurrentHashMap[Int, java.util.Vector[Long]]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null && te.taskInfo.successful)
        byStage.computeIfAbsent(te.stageId,
          _ => new java.util.Vector[Long]()).add(te.taskInfo.duration)
    def totalTasks: Int = {
      var n = 0
      byStage.forEach((_, v) => n += v.size)
      n
    }
    def stageDurations: Map[Int, Seq[Long]] = {
      import scala.jdk.CollectionConverters._
      byStage.asScala.map { case (k, v) => k -> v.asScala.toSeq.map(_.longValue) }
        .toMap
    }
  }

  /** The listener bus is async; wait until the task count stops moving. */
  private def settled(l: TaskStatsListener): Map[Int, Seq[Long]] = {
    var prev = -1
    var cur = l.totalTasks
    while (prev != cur) { Thread.sleep(250); prev = cur; cur = l.totalTasks }
    l.stageDurations
  }

  /** No stage may have a task slower than factor x its median (stages with
    * too few tasks for a meaningful median, or finishing entirely inside the
    * absolute floor — scheduling/JIT noise at test scale — are skipped). */
  private def assertNoDominantTask(stats: Map[Int, Seq[Long]], factor: Double,
      floorMs: Long): Unit = {
    val checked = stats.filter { case (_, ds) => ds.size >= 8 }
    assert(checked.nonEmpty, "stress produced no stage with >= 8 tasks")
    for ((stage, ds) <- checked) {
      val sorted = ds.sorted
      val med = sorted(ds.size / 2)
      val max = sorted.last
      assert(max <= math.max(factor * med, med + floorMs),
        s"stage $stage dominated by one task: max ${max}ms vs median " +
          s"${med}ms over ${ds.size} tasks")
    }
  }

  private def withTaskStats[A](body: => A): (A, Map[Int, Seq[Long]]) = {
    val l = new TaskStatsListener
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      (r, settled(l))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  import SkewStressSpec.{coldDna, hotDna, randDna}

  test("salted LCA fold under a ~30% hot minimizer: no dominant task, " +
    "salted == unsalted") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "16")
    import ss.implicits._
    // m << k so one low-priority m-mer persists across a whole window run:
    // each motif occurrence then contributes ONE supermer record keyed by
    // the SAME minimizer, which is what concentrates the fold key
    val params = IndexParams(k = 31, m = 11, spaces = 3, buckets = 32)
    val tax = Taxonomy.fromTuples(
      (0 until 10).map(i => (10 + i, 1, "species", s"sp$i")))
    val bcTax = ss.sparkContext.broadcast(tax)
    val index = new MinimizerIndex(params, bcTax)
    // ~1.5M library bases (sf0.1's g02 volume). 60% of genomes are "hot": a
    // fixed motif separated by short unique spacers, so ONE minimizer recurs
    // across many SEPARATE supermers — a pure repeat would collapse into a
    // single supermer record and not stress the fold at all. The remaining
    // genomes are random, giving the long tail of singleton keys. Which
    // m-mer wins inside a random motif (and how much its fixed flanks
    // dilute it) depends on the scrambled priority, so the motif is chosen
    // by a local driver-side search over candidate seeds: scans are pure.
    val scanner = params.scanner
    def sampleTopShare(motif: String): Double = {
      val counts = collection.mutable.HashMap.empty[Long, Long]
      def add(dna: String): Unit =
        scanner.scan(dna).foreach(sm =>
          counts.update(sm.minimizer, counts.getOrElse(sm.minimizer, 0L) + 1))
      for (i <- 0 until 60) add(hotDna(motif, i))
      for (i <- 0 until 40) add(coldDna(i))
      counts.values.max.toDouble / counts.values.sum
    }
    val (motif, sampled) = (1 to 64).map(s => randDna(s, 24))
      .map(m => (m, sampleTopShare(m))).maxBy(_._2)
    assert(sampled >= 0.22,
      f"no motif candidate concentrates the record stream (best $sampled%.3f)")
    val nGenomes = 2000
    val lib = ss.range(nGenomes).repartition(16).map { i =>
      val taxon = 10 + (i % 10).toInt
      val dna = if (i % 10 < 6) hotDna(motif, i) else coldDna(i)
      (taxon, dna)
    }
    // fixture self-check: the motif really concentrates the record stream
    val recordsRaw = lib.flatMap { case (_, dna) =>
      params.scanner.scan(dna).map(_.minimizer)
    }
    val total = recordsRaw.count().toDouble
    val topShare = recordsRaw.toDF("m").groupBy("m").count()
      .orderBy(desc("count")).limit(1).collect()(0).getLong(1) / total
    assert(topShare >= 0.18,
      f"fixture lost its skew: top minimizer holds $topShare%.3f of records")
    info(f"hot minimizer share: $topShare%.3f of ${total.toLong} records")

    val (salted, stats) = withTaskStats {
      index.makeRecords(lib, saltBuckets = 16)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assertNoDominantTask(stats, factor = 6.0, floorMs = 2000)
    val unsalted = index.makeRecords(lib, saltBuckets = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(salted == unsalted, "salting changed the LCA fold result")
  }

  test("MinHash-LSH under 50% boilerplate docs: buckets capped, planted " +
    "dups found, no dominant task") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "16")
    import ss.implicits._
    // 5,000 docs (sf0.1 volume): half share a 300-char boilerplate block
    // (unique 8-char tail), the rest are random prose; 10 planted near-dup
    // pairs among the RANDOM docs must survive the bucket caps
    val boiler = ("spark native analytics engine template header " * 7).trim
    def prose(seed: Long, words: Int): String = {
      var s = graft.functions.TextAnalysis.mix64(seed)
      (0 until words).map { _ =>
        s = graft.functions.TextAnalysis.mix64(s)
        "w" + java.lang.Long.toHexString(s & 0xffffffL)
      }.mkString(" ")
    }
    val nDocs = 5000
    val docs = ss.range(nDocs).repartition(16).map { id =>
      val i = id.toLong
      val text =
        if (i % 2 == 0) boiler + " tail" + i
        else if (i % 2 == 1 && i < 20)
          // docs 1,3,..,19 duplicate docs 5001,5003,..,5019 (planted below)
          prose(i / 2 * 31 + 5, 60)
        else prose(i * 31 + 5, 60)
      (i, text)
    }
    val planted = ss.range(nDocs, nDocs + 20).filter((i: java.lang.Long) => i % 2 == 1).map { id =>
      val i = id.toLong
      val j = i - nDocs
      (i, prose(j / 2 * 31 + 5, 60) + " edited")
    }
    val corpus = docs.union(planted)

    val (pairs, stats) = withTaskStats {
      graft.operators.Dedup.minhashDedup(corpus, shingleN = 3,
        numHashes = 32, bands = 8, threshold = 0.7, maxBucket = 256)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assertNoDominantTask(stats, factor = 6.0, floorMs = 2000)
    for (j <- 1 until 20 by 2)
      assert(pairs.contains((j.toLong, (nDocs + j).toLong)),
        s"planted near-dup pair ($j, ${nDocs + j}) lost under skew: " +
          s"${pairs.size} pairs found")
    // the capped mega-bucket must not flood the candidate set: without caps
    // the boilerplate half alone would generate ~8 x 2500^2 candidates
    // (~3M verified pairs); shared-tail trigram coincidences may legitimately
    // verify a few boilerplate pairs, but never the quadratic blowup
    assert(pairs.size < 100000,
      s"boilerplate mega-bucket leaked through the cap: ${pairs.size} pairs")
  }

  test("span dedup under 50% boilerplate + single-gram flood docs: spans " +
    "exact, no dominant task") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "16")
    import ss.implicits._
    def prose(seed: Long, words: Int): String = {
      var s = graft.functions.TextAnalysis.mix64(seed)
      (0 until words).map { _ =>
        s = graft.functions.TextAnalysis.mix64(s)
        "w" + java.lang.Long.toHexString(s & 0xffffffL)
      }.mkString(" ")
    }
    // 5,000 docs (sf0.1 volume). Half carry a shared 50-word boilerplate
    // block (43 hot gram keys x 2500 positions each); 100 are single-word
    // floods, so ONE gram key holds ~19k positions — the adversarial case
    // for the join back on the gram digest. Unlike LSH, span dedup never
    // pairs positions, so no cap exists to hide behind: the output must be
    // exact AND the stage must stay balanced.
    val boiler = prose(999983L, 50)
    val nDocs = 5000
    val corpus = ss.range(nDocs).repartition(16).map { id =>
      val i = id.toLong
      // disjoint seed spaces ((i << 8) | slot): equal seeds would plant
      // REAL duplicated prose runs across docs and break the span oracle
      val text =
        if (i % 50 == 7) Seq.fill(200)("spam").mkString(" ")
        else if (i % 2 == 0)
          prose((i << 8) | 1, 30) + " " + boiler + " " + prose((i << 8) | 2, 20)
        else prose((i << 8) | 3, 100)
      (i, text)
    }
    val (rows, stats) = withTaskStats {
      graft.operators.Dedup.duplicateSpans(corpus, n = 8)
        .collect()
        .map(r => (r.getAs[Number](0).longValue, (r.getAs[Number](1).longValue,
          r.getAs[Number](2).longValue, r.getAs[Number](3).longValue)))
        .toSeq
    }
    assertNoDominantTask(stats, factor = 6.0, floorMs = 2000)
    val spans = rows.toMap
    assert(rows.size == spans.size, "some document produced multiple spans")
    // every boilerplate doc: exactly one span covering words 31..80
    // (43 duplicated 8-gram starts); every flood doc: one whole-doc span
    for (i <- 0L until nDocs.toLong) {
      if (i % 50 == 7)
        assert(spans(i) == ((1L, 200L, 193L)), s"flood doc $i: ${spans(i)}")
      else if (i % 2 == 0)
        assert(spans(i) == ((31L, 80L, 43L)), s"boiler doc $i: ${spans(i)}")
      else
        assert(!spans.contains(i), s"unique doc $i got a span: ${spans.get(i)}")
    }
  }
  test("bounded top-k under one dominant source (90% of corpus): result " +
    "equals the window rank, no dominant task") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "16")
    import ss.implicits._
    import org.apache.spark.sql.functions._
    // 50,000 docs, 90% in source "mega" — the t17/t23 adversarial case: a
    // row_number().over(partitionBy(source)) window would sort all 45k mega
    // rows in ONE task; the bounded aggregate must keep every task near the
    // median because each map task retains <= k rows per source
    val nDocs = 50000
    val corpus = ss.range(nDocs).repartition(16).select(
      when($"id" % 10 < 9, "mega").otherwise(concat(lit("s"), $"id" % 7))
        .as("source"),
      ($"id" * 2654435761L % 100003).as("n_chars"),
      $"id".as("doc_id"))
    graft.functions.TopKAggregate.register(ss, k = 5,
      desc = Seq(true, false), name = "tk_skew")
    val (got, stats) = withTaskStats {
      corpus.groupBy($"source")
        .agg(graft.functions.TopKAggregate
          .topK("tk_skew", struct($"n_chars", $"doc_id")).as("top"))
        .select($"source", posexplode($"top"))
        .select($"source", $"col.doc_id".as("doc_id"),
          ($"pos" + 1).cast("long").as("rk"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assertNoDominantTask(stats, factor = 6.0, floorMs = 2000)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n_chars".desc, $"doc_id".asc)
    val want = corpus.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, "bounded top-k diverged from the window rank")
    assert(got.count(_._1 == "mega") == 5)
  }

  test("SemDeDup under one giant cluster (80% near-duplicates): pair join " +
    "sub-bucketed to the cap, dups still collapse, no dominant task") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "16")
    import ss.implicits._
    import SkewStressSpec.skewEmbedding
    // 2,000 vectors: 80% tiny perturbations of one base vector (all-near-
    // duplicate corpus — k-means puts them in ONE cluster no matter how k
    // is chosen), 20% random. Without the population cap the pair join
    // materializes ~1600^2/2 ~ 1.3M pairs in whatever tasks hold that
    // cluster; with cap=100 it is split into 16 hash sub-buckets.
    val nVec = 2000
    val cap = 100
    val emb = ss.range(nVec).repartition(16)
      .map(i => (i, skewEmbedding(i, nVec)))
      .toDF("vec_id", "embedding")
    val asg = graft.operators.Clustering.assignments(emb, k = 4, iters = 2)
      .persist()
    val pops = asg.groupBy("cluster").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (giant, giantPop) = pops.maxBy(_._2)
    assert(giantPop >= 1500, s"fixture lost its skew: cluster pops $pops")
    // structural bound: after splitting, no (cluster, sub) group exceeds
    // ~cap (2x slack for hash variance) => no task ever reads more than
    // ~(2*cap)^2 candidate pairs from one group, vs 1600^2 unguarded
    val groups = graft.operators.Clustering.subBucketed(asg, cap)
      .groupBy("cluster", "sub").count()
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val maxGroup = groups.map(_._2).max
    assert(maxGroup <= 2L * cap,
      s"sub-bucketing failed to bound the pair join: max group $maxGroup")
    val giantSubs = groups.count(_._1._1 == giant)
    assert(giantSubs >= (giantPop / cap).toInt,
      s"giant cluster split into only $giantSubs sub-buckets")
    asg.unpersist()

    val scope = new graft.operators.Dedup.CacheScope
    val (decisions, stats) = withTaskStats {
      graft.operators.Clustering.semanticDecisions(emb, k = 4, iters = 2,
          tau = 0.8, scope = scope, maxClusterPop = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    }
    scope.release()
    assertNoDominantTask(stats, factor = 6.0, floorMs = 2000)
    assert(decisions.length == nVec)
    // every near-duplicate sub-bucket collapses to exactly one keeper: the
    // perturbed vectors' pairwise cosine clears tau, so each sub-bucket is
    // one connected component. Keepers among the near-dups == sub-buckets
    // of the giant cluster — the documented recall cost of the split (vs 1
    // keeper unguarded), bounded and proportional to pop/cap, never silent
    val nearDupKeepers = decisions
      .count(d => SkewStressSpec.isNearDup(d._1) && d._4)
    assert(nearDupKeepers == giantSubs,
      s"expected $giantSubs near-dup keepers (one per sub-bucket), " +
        s"got $nearDupKeepers")
    // reps are self-consistent: every rep is a kept member of the corpus
    val keepers = decisions.filter(_._4).map(_._1).toSet
    val reps = decisions.map(_._3).toSet
    assert(reps.subsetOf(keepers), "some rep is not itself kept")
  }
}

object SkewStressSpec {
  /** Hot genome: 25 copies of the motif with unique 6 bp spacers (~750 bp).
    * The unit (motif+spacer, 30 bp) barely exceeds the k-m+1 = 21 window
    * starts one minimizer can own, so most of each unit's records carry the
    * motif's minimal m-mer. */
  private def hotDna(motif: String, i: Long): String =
    (0 until 25).map(j => motif + randDna(i * 100 + j, 6)).mkString

  /** Cold genome: 300 bp of unique random sequence. */
  private def coldDna(i: Long): String = randDna(i + 7777, 300)

  /** 64-dim embedding fixture for the SemDeDup skew test: id 0 = the
    * near-dup base, ids 1-3 = distinct random anchors (k-means init takes
    * the k smallest vec_ids, so these seed 4 separated centroids), ids >= 4
    * with i % 5 != 0 = tiny perturbations of the base (the 80% near-dup
    * mass that collapses into one cluster), the rest random. */
  private def skewEmbedding(i: Long, nVec: Int): Array[Float] = {
    def rand(seed: Long): Array[Float] = {
      var s = graft.functions.TextAnalysis.mix64(seed)
      Array.tabulate(64) { _ =>
        s = graft.functions.TextAnalysis.mix64(s)
        (s >> 11).toFloat / (1L << 52).toFloat
      }
    }
    if (i == 0L) rand(42L)
    else if (i < 4L) rand(7000L + i)
    else if (i % 5 == 0) rand(i * 31 + 97)
    else {
      val b = rand(42L)
      val n = rand(i)
      Array.tabulate(64)(d => b(d) + 0.01f * n(d))
    }
  }

  private def isNearDup(i: Long): Boolean = i == 0L || (i >= 4L && i % 5 != 0)

  /** Deterministic pseudo-random DNA (object-level: executor closures must
    * not capture the spec instance). */
  private def randDna(seed: Long, len: Int): String = {
    val sb = new java.lang.StringBuilder(len)
    var s = graft.functions.TextAnalysis.mix64(seed)
    var i = 0
    while (i < len) {
      s = graft.functions.TextAnalysis.mix64(s)
      sb.append("ACGT".charAt((s & 3L).toInt))
      i += 1
    }
    sb.toString
  }
}
