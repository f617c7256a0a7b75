package graft

import org.apache.spark.sql.SparkSession
import graft.index._
import graft.sources.Sequences
import graft.taxa.Taxonomy

/** Standalone CLI with the reference tool's command surface
  * (spec: reference slacken/Slacken.scala subcommands):
  *
  *   build     -k 35 -m 31 -s 7 -p 32 --library lib.fna --labels l.tsv
  *             --taxonomy dir --output idx
  *   classify  --index idx --reads r.fastq [--reads2 r2.fastq] [-c 0.0]
  *             [--min-hit-groups 2] [--sample-regex re] --output out
  *   classify2 --index idx --library lib.fna --labels l.tsv --reads r.fastq
  *             [--rank species] [--threshold 100] --output out
  *   bracken   --index idx --library lib.fna --labels l.tsv [--read-len 100]
  *             --output out
  *   stats     --index idx [--respace s] --output out
  *   report    --index idx --classified out  (kreport to stdout)
  */
object Main {

  private def parseArgs(args: Array[String]): (String, Map[String, String]) = {
    require(args.nonEmpty, "usage: <command> [--opt value ...]")
    val cmd = args(0)
    val opts = collection.mutable.Map.empty[String, String]
    var i = 1
    while (i < args.length) {
      val key = args(i).dropWhile(_ == '-')
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        opts(key) = args(i + 1); i += 2
      } else { opts(key) = "true"; i += 1 }
    }
    (cmd, opts.toMap)
  }

  def session(buckets: Int): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      // shuffle partitions pinned to the index bucket count so bucketed
      // joins stay shuffle-free on the index side
      .config("spark.sql.shuffle.partitions", buckets.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def loadTaxonomy(spark: SparkSession, dir: String): Taxonomy = {
    def lines(f: String): Iterator[String] = {
      val p = new org.apache.hadoop.fs.Path(dir, f)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Iterator.empty
      else scala.io.Source.fromInputStream(fs.open(p)).getLines()
    }
    Taxonomy.fromDumpLines(lines("nodes.dmp"), lines("names.dmp"), lines("merged.dmp"))
  }

  private def loadLibrary(spark: SparkSession, opts: Map[String, String]) = {
    import spark.implicits._
    val fasta = opts.get("library-fai") match {
      case Some(fai) => graft.sources.IndexedFasta.fragments(spark, fai,
        opts.getOrElse("k", "35").toInt)
      case None => Sequences.fasta(spark, opts("library"))
    }
    val labels = Sequences.labels(spark, opts("labels"))
    fasta.toDF("header", "location", "nucleotides", "nucleotides2")
      .join(labels, "header")
      .select($"taxon", $"nucleotides").as[(Int, String)]
  }

  private def loadReads(spark: SparkSession, opts: Map[String, String]) = {
    val path = opts("reads")
    val r1 =
      if (path.endsWith(".fastq") || path.endsWith(".fq") || path.contains("fastq"))
        Sequences.fastq(spark, path)
      else Sequences.fasta(spark, path)
    opts.get("reads2") match {
      case Some(p2) => Sequences.paired(r1, Sequences.fastq(spark, p2))
      case None => r1
    }
  }

  def main(args: Array[String]): Unit = {
    val (cmd, opts) = parseArgs(args)
    val buckets = opts.getOrElse("p", "32").toInt

    cmd match {
      case "build" =>
        val spark = session(buckets)
        val m = opts.getOrElse("m", "31").toInt
        val k = opts.getOrElse("k", "35").toInt
        val tax = loadTaxonomy(spark, opts("taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        if (m > 32) {
          // wide-minimizer path: two-long keys, no spaced seed
          val index = new WideMinimizerIndex(k, m, bcTax)
          val records = index.makeRecords(loadLibrary(spark, opts))
          index.writeRecords(records, opts("output"), buckets)
          println(s"index written (wide m=$m): " +
            s"${index.loadRecords(spark, opts("output"), buckets).count()} records")
        } else {
          val params = IndexParams(k = k, m = m,
            spaces = opts.getOrElse("s", "7").toInt, buckets = buckets)
          val index = new MinimizerIndex(params, bcTax)
          val records = index.makeRecords(loadLibrary(spark, opts))
          index.writeRecords(records, opts("output"))
          println(s"index written: ${index.loadRecords(spark, opts("output")).count()} records")
        }

      case "classify" =>
        val idxPath = opts("index")
        val spark = session(buckets)
        val params = IndexParams.read(spark, idxPath)
        // getOrCreate returns the existing session, so pin the partition
        // count at runtime (it is a runtime-settable SQL conf)
        spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
        val tax = loadTaxonomy(spark, opts.getOrElse("taxonomy", idxPath + "/taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        // wide (m>32) and narrow share the span protocol and ClassifyKernel,
        // so per-read output, paired-end and confidence work at any m
        val classified = (if (params.m > 32) {
          val wide = new WideMinimizerIndex(params.k, params.m, bcTax)
          val records = wide.loadRecords(spark, idxPath, params.buckets)
          wide.classify(wide.spans(loadReads(spark, opts)), records,
            confidence = opts.getOrElse("c", "0.0").toDouble,
            minHitGroups = opts.getOrElse("min-hit-groups", "2").toInt)
        } else {
          val (index, records) = MinimizerIndex.open(spark, idxPath, bcTax)
          index.classify(index.spans(loadReads(spark, opts)), records,
            confidence = opts.getOrElse("c", "0.0").toDouble,
            minHitGroups = opts.getOrElse("min-hit-groups", "2").toInt)
        }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        IndexOps.writePerSampleOutput(classified,
          opts.getOrElse("sample-regex", "^(.*)$"), opts("output"))
        ClassifyKernel.report(classified, bcTax).lines.foreach(println)
        classified.unpersist()

      case "classify2" =>
        val idxPath = opts("index")
        val spark = session(buckets)
        val params = IndexParams.read(spark, idxPath)
        spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
        val tax = loadTaxonomy(spark, opts.getOrElse("taxonomy", idxPath + "/taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        val dyn = new DynamicClassifier(params, bcTax)
        val records = MinimizerIndex.loadRecords(spark, idxPath, params.buckets)
        val (classified, selected) = dyn.classify2(
          loadReads(spark, opts), loadLibrary(spark, opts), records,
          rank = opts.getOrElse("rank", "species"),
          threshold = opts.getOrElse("threshold", "100").toLong)
        println(s"selected ${selected.size} taxa")
        IndexOps.writePerSampleOutput(classified,
          opts.getOrElse("sample-regex", "^(.*)$"), opts("output"))

      case "bracken" =>
        val idxPath = opts("index")
        val spark = session(buckets)
        val params = IndexParams.read(spark, idxPath)
        spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
        val tax = loadTaxonomy(spark, opts.getOrElse("taxonomy", idxPath + "/taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        val records = MinimizerIndex.loadRecords(spark, idxPath, params.buckets)
        val bracken = new Bracken(params, bcTax)
        val w = bracken.weights(loadLibrary(spark, opts), records,
          readLen = opts.getOrElse("read-len", "100").toInt)
        bracken.weightLines(w).write.option("sep", "\t").mode("overwrite")
          .csv(opts("output"))

      case "stats" =>
        val idxPath = opts("index")
        val spark = session(buckets)
        val params = IndexParams.read(spark, idxPath)
        spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
        val tax = loadTaxonomy(spark, opts.getOrElse("taxonomy", idxPath + "/taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        var records = MinimizerIndex.loadRecords(spark, idxPath, params.buckets)
        for (s <- opts.get("respace"))
          records = IndexOps.respace(records, params, s.toInt, bcTax)
        IndexOps.minimizersPerTaxon(records)
          .write.option("sep", "\t").mode("overwrite").csv(opts("output"))
        IndexOps.depthHistogram(records, bcTax).show(50)

      case other =>
        System.err.println(s"unknown command: $other")
        sys.exit(2)
    }
  }
}
