package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.index.{ClassifyKernel, DynamicClassifier, IndexParams,
  MinimizerIndex}
import graft.operators.GenomicQueries
import graft.sources.InputFragment

/** Stage-by-stage wall-clock breakdown of the g10 per-sample dynamic
  * classification lane (r19 verdict ask #4: sf1→sf5 exponent 1.26 — name
  * the super-linear phase). Replicates g10_multisample_classify2 exactly
  * (same derivations, same DynamicClassifier internals — see
  * Dynamic.classify2MultiSample), but materializes each phase as its own
  * job over the previous phase's persisted output, so the timings diff
  * cleanly (the BuildProfile discipline):
  *
  *   1. reads_derive    orders ⋈ customer + md5 genome synthesis (persisted
  *                      so later phases never re-pay it)
  *   2. static_records  library supermer scan + LCA fold
  *   3. spans           read supermer scan (the spans both passes share)
  *   4. evidence        spans ⋈ records + per-(sample,taxon) countDistinct
  *                      + driver collect
  *   5. selection       driver-side per-sample taxon selection + grouping
  *   6. subindex        union-selection leaf pairs ⋈ grp tag + LCA fold
  *   7. second_pass     tagged spans ⋈ dyn records + resolve + final counts
  *
  * Usage: runMain graft.tools.G10Profile <sfDir> [reps]
  * Prints one [g10profile] line per phase per rep plus a JSON summary. */
object G10Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val phases = collection.mutable.LinkedHashMap
      .empty[String, Vector[Double]]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      phases(name) = phases.getOrElse(name, Vector.empty) :+ s
      println(f"[g10profile] $name%-16s $s%8.2f s")
      r
    }

    for (rep <- 0 until reps) {
      println(s"[g10profile] --- rep $rep ($sfDir) ---")
      val params = IndexParams(k = 35, m = 31, spaces = 7, buckets = 32)
      val bcTax = spark.sparkContext.broadcast(
        GenomicQueries.starTaxonomy(spark, sfDir))
      val dyn = new DynamicClassifier(params, bcTax)
      val index = dyn.index

      // g10's derivations verbatim (GenomicQueries.scala g10 lane),
      // including the r21 scale-adaptive scan fan-out (Q.fanOut)
      val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      val lib = graft.operators.Q
        .fanOut(customer, col("c_custkey"))
        .select((col("c_nationkey") + 10).cast("int").as("taxon"),
          GenomicQueries.dnaCol(col("c_name")).as("dna"))
        .as[(Int, String)]
      val customerDna = customer.select(col("c_custkey"), col("c_nationkey"),
        GenomicQueries.dnaCol(col("c_name")).as("dna"))
      val readsDf = graft.operators.Q
        .fanOut(spark.read.parquet(s"$sfDir/orders.parquet"), col("o_orderkey"))
        .join(customerDna, col("o_custkey") === col("c_custkey"))
        .filter((col("c_nationkey") % 5) ===
          substring(col("o_orderpriority"), 1, 1).cast("int") - 1)
        .select(col("o_orderkey"), col("o_orderpriority"),
          substring(col("dna"), ((col("o_orderkey") % 80) + 1).cast("int"),
            lit(44)).as("read"))
        .as[(Long, String, String)]
        .map { case (ok, pri, read) =>
          InputFragment(s"S${pri.take(1)}R$ok", 0L, read, None)
        }
      val reads = readsDf.persist(StorageLevel.MEMORY_AND_DISK)
      time("reads_derive")(println("  reads: " + reads.count()))

      // r21: the lane builds its static records by folding CACHED leaf
      // pairs, which the sub-index phase then re-folds per group instead of
      // re-extracting the library (GenomicQueries g10 / Dynamic.scala
      // staticLeafPairs) — mirrored here so the phases stay honest
      val leafPairs = index.buildLeafPairs(lib)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val staticRecords = index.foldLeafPairs(leafPairs)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("static_records")(println("  records: " + staticRecords.count()))

      // r21: the sample id is extracted once into the cached span frame
      // (classify2MultiSample does the same) — enumeration, evidence and
      // the tag join all read the cached column
      val spans = index.spansDF(reads)
        .withColumn("sample", regexp_extract(col("title"), "(S\\d)R", 1))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("spans")(println("  spans: " + spans.count()))

      // classify2MultiSample internals from here (Dynamic.scala:226-298),
      // DistinctMinimizers criterion / rank species / threshold 50
      val keys = index.keyCols
      val ev = time("evidence") {
        // r22: distinct (sample, key) pairs BEFORE the join, count after —
        // mirrors Dynamic.classify2MultiSample's evidence rewrite (the
        // records side is unique per key, so the joined row count equals
        // the old per-(sample, taxon) countDistinct)
        spans.select((col("sample") +: keys.map(col)): _*).distinct()
          .join(staticRecords, keys)
          .groupBy(col("sample"), col("taxon"))
          .agg(count(lit(1)).cast("long").as("count"))
          .as[(String, Int, Long)].collect()
      }
      println(s"  evidence rows: ${ev.length}")

      // the sample enumeration is its own distributed scan over the cached
      // spans — timed as its own phase so the per-phase sum reconciles
      // with the lane's end-to-end wall
      val samples = time("sample_enum") {
        spans.select(col("sample")).distinct()
          .as[String].collect()
      }
      val (perSample, groups, sampleGrp) = time("selection") {
        val bySample = ev.groupBy(_._1)
        val per = samples.map { s =>
          s -> dyn.selectTaxa(
            bySample.getOrElse(s, Array.empty).map(e => (e._2, e._3)),
            "species", 50L)
        }.toMap
        val grps = per.values.toSeq.distinct.zipWithIndex
        val grpOfSet = grps.toMap
        (per, grps, per.toSeq.map { case (s, t) => (s, grpOfSet(t)) })
      }
      println(s"  samples: ${samples.length}, distinct selections: ${groups.length}")

      val dynRecords = time("subindex") {
        val taxonGrp = groups
          .flatMap { case (set, g) => set.toSeq.map(t => (t, g)) }
          .toDF("taxon", "grp")
        // r21: re-fold the CACHED static leaf pairs (the broadcast
        // taxon->grp join restricts to the union of selections by itself)
        val r = index.foldLeafPairs(
            leafPairs.join(broadcast(taxonGrp), "taxon"),
            extraCols = Seq("grp"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        println("  dyn records: " + r.count())
        r
      }

      time("second_pass") {
        val taggedSpans = spans
          .join(broadcast(sampleGrp.toDF("sample", "grp")), Seq("sample"))
        // detail=false like the lane (count-only regroup — classifyJoined)
        val result = ClassifyKernel.classifyJoined(
          taggedSpans.join(dynRecords, "grp" +: keys, "left"),
          bcTax, 0.0, 1, detail = false)
        result.toDF()
          .groupBy(regexp_extract(col("title"), "(S\\d)R", 1).as("sample"),
            col("taxon").cast("long").as("taxon"))
          .agg(count(lit(1)).cast("long").as("n_reads"))
          .write.format("noop").mode("overwrite").save()
      }

      spans.unpersist(); staticRecords.unpersist(); leafPairs.unpersist()
      dynRecords.unpersist(); reads.unpersist()
      bcTax.destroy()
    }

    def num(d: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val json = phases.map { case (k, vs) =>
      "\"" + k + "\":{\"min\":" + num(vs.min) + ",\"reps\":" +
        vs.map(num).mkString("[", ",", "]") + "}"
    }.mkString("{\"sf_dir\":\"" + sfDir + "\",\"phases\":{", ",", "}}")
    println(json)
  }
}
