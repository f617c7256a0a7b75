package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{Bracken, IndexParams, MinimizerIndex}
import graft.sources.Sequences
import graft.taxa.Taxonomy
import scala.collection.mutable

/** Stage-by-stage wall-clock breakdown of the bracken weights pipeline —
  * the diagnostic behind the r16 64x head-to-head finding. Each stage is an
  * independent job (timings are cumulative; diff successive lines). Run it
  * exactly like the harness runs graft:
  *   java <spark flags> -cp $SPARKCP:target/scala-2.13/classes \
  *     graft.tools.BrackenProfile <indexDir> <library.fna> <labels.map> [readLen]
  */
object BrackenProfile {
  def main(args: Array[String]): Unit = {
    val Array(idxPath, library, labels) = args.take(3)
    val readLen = args.lift(3).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val params = IndexParams.read(spark, idxPath)
    spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
    val tax = graft.Main.loadTaxonomy(spark, idxPath + "/taxonomy")
    val bcTax = spark.sparkContext.broadcast(tax)
    val index = new MinimizerIndex(params, bcTax)
    val records = MinimizerIndex.loadRecords(spark, idxPath, params.buckets)
    val bracken = new Bracken(index, bcTax)

    time("records count")(println("  records: " + records.count()))

    val lib = {
      val lb = Sequences.labels(spark, labels)
      Sequences.fasta(spark, library)
        .toDF("header", "location", "nucleotides", "nucleotides2")
        .join(broadcast(lb), "header")
        .select($"taxon", $"nucleotides").as[(Int, String)]
    }
    time("library count")(println("  genomes: " + lib.count()))

    val frags = bracken.fragments(lib, readLen).toDF("taxon", "seq", "header", "location")
    time("fragments count")(println("  frags: " + frags.count()))

    val idx = index
    val kk = index.kOf
    val mins = frags.select($"header", $"location", $"seq").as[(String, Long, String)]
      .flatMap { case (h, loc, seq) =>
        val set = mutable.HashSet.empty[Long]
        graft.kmers.SupermerScanner.splitByAmbiguity(seq).foreach { run =>
          if (run.valid && run.seq.length >= kk)
            idx.scanKeyed(run.seq).foreach(sm => set += sm.k1)
        }
        set.iterator.map(m => (h, loc, m))
      }.toDF("header", "location", "id1")
    time("scan1: distinct mins")(println("  mins: " + mins.count()))

    val lcas = mins.join(records, Seq("id1"), "left")
      .groupBy($"header", $"location")
      .agg(collect_list(struct($"id1".as("k1"), lit(0L).as("k2"),
        lit(0L).as("k3"), lit(0L).as("k4"),
        coalesce($"taxon", lit(Taxonomy.NONE)).as("taxon"))).as("lcas"))
    time("scan1+join+collect")(println("  lca groups: " + lcas.count()))

    // A/B retained deliberately: this stage decodes the per-fragment LCA
    // map through a Dataset[Seq[tuple5]] encoder over the NON-deduped
    // fragment frame — the r16 hotspot (measured 170-172 s at the 64x tier
    // vs 4.6 s for the shipped primitive-array + content-weighted path in
    // "full weights" below). Boxed nested-tuple decode is the cost, not
    // the scan or the window slide.
    val joined = frags.join(lcas, Seq("header", "location"), "left")
      .select($"taxon", $"seq", $"lcas")
      .as[(Int, String, Seq[(Long, Long, Long, Long, Int)])]
    val runsOnly = joined.map { case (_, seq, lcaTuples) =>
      val lcaOf = Option(lcaTuples).getOrElse(Seq.empty)
        .map(t => (t._1, t._2, t._3, t._4) -> t._5).toMap
      var n = 0L
      graft.kmers.SupermerScanner.splitByAmbiguity(seq).foreach { run =>
        if (run.valid && run.seq.length >= kk)
          idx.scanKeyed(run.seq).foreach { sm =>
            if (lcaOf.getOrElse((sm.k1, sm.k2, sm.k3, sm.k4),
                Taxonomy.NONE) != Taxonomy.NONE) n += 1
          }
      }
      n
    }
    time("scan2+lookup (no slide)")(println("  hit supermers: " +
      runsOnly.reduce(_ + _)))

    time("full weights")(
      bracken.weights(lib, records, readLen)
        .write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
