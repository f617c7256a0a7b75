package graft

import org.apache.spark.sql.SparkSession
import graft.index._
import graft.sources.Sequences
import graft.taxa.Taxonomy

/** Standalone CLI with the reference tool's command surface
  * (spec: reference slacken/Slacken.scala subcommands):
  *
  *   build     -k 35 -m 31 -s 7 -p 32 [--salt N] --library lib.fna
  *             --labels l.tsv --taxonomy dir --output idx
  *   classify  --index idx --reads r.fastq [--reads2 r2.fastq]
  *             [-c 0.0 | -c 0.0,0.1,0.5] [--min-hit-groups 2]
  *             [--sample-regex re] --output out
  *   classify2 --index idx --library lib.fna --labels l.tsv --reads r.fastq
  *             [--rank species] [--threshold 100] [--bracken-read-len 100]
  *             --output out
  *   bracken   --index idx --library lib.fna --labels l.tsv [--read-len 100]
  *             --output out
  *   compare   --taxonomy dir --classified out --truth mapping.tsv
  *             [--rank species] [--output categories]
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

  private def libraryFasta(spark: SparkSession, opts: Map[String, String]) =
    opts.get("library-fai") match {
      case Some(fai) => graft.sources.IndexedFasta.fragments(spark, fai,
        opts.getOrElse("k", "35").toInt)
      case None => Sequences.fasta(spark, opts("library"))
    }

  private def loadLibrary(spark: SparkSession, opts: Map[String, String]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    // the label table (one short row per sequence) is orders of magnitude
    // smaller than the genomes: broadcasting it keeps genome payloads from
    // ever shuffling in this join
    val labels = Sequences.labels(spark, opts("labels"))
    libraryFasta(spark, opts)
      .toDF("header", "location", "nucleotides", "nucleotides2")
      .join(broadcast(labels), "header")
      .select($"taxon", $"nucleotides").as[(Int, String)]
  }

  /** Library as 2-bit packed valid runs, packed BEFORE the label join: if
    * the join ever does shuffle (label side too big to broadcast), genome
    * payloads move at 2 bits/base instead of UTF-8 text. */
  private def loadPackedLibrary(spark: SparkSession, opts: Map[String, String],
      k: Int): org.apache.spark.sql.Dataset[(Int, Array[Byte], Int)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    import graft.kmers.{Dna, SupermerScanner}
    val labels = Sequences.labels(spark, opts("labels"))
    val runs = libraryFasta(spark, opts).flatMap { f =>
      SupermerScanner.splitByAmbiguity(f.nucleotides).collect {
        case run if run.valid && run.seq.length >= k =>
          (f.header, Dna.pack2bit(run.seq), run.seq.length)
      }
    }.toDF("header", "packed", "len")
    runs.join(broadcast(labels), "header")
      .select($"taxon", $"packed", $"len").as[(Int, Array[Byte], Int)]
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
        // --salt N: two-stage LCA fold for skewed (low-complexity) libraries
        val salt = opts.getOrElse("salt", "0").toInt
        if (m > 32) {
          // wide-minimizer path: two-long keys, no spaced seed; built from
          // the 2-bit packed library like the narrow path
          val index = new WideMinimizerIndex(k, m, bcTax)
          val records = index.makeRecordsPacked(loadPackedLibrary(spark, opts, k), salt)
          index.writeRecords(records, opts("output"), buckets)
          println(s"index written (wide m=$m): " +
            s"${index.loadRecords(spark, opts("output"), buckets).count()} records")
        } else {
          val params = IndexParams(k = k, m = m,
            spaces = opts.getOrElse("s", "7").toInt, buckets = buckets)
          val index = new MinimizerIndex(params, bcTax)
          // build from the 2-bit packed library: same records, 1/4 the
          // payload bytes anywhere the library moves
          val records = index.makeRecordsPacked(loadPackedLibrary(spark, opts, k), salt)
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
        val sampleRegex = opts.getOrElse("sample-regex", "^(.*)$")
        val minHitGroups = opts.getOrElse("min-hit-groups", "2").toInt
        // -c accepts a comma-separated threshold list (reference cached
        // sweep, Classifier.scala:156-170)
        val confs = opts.getOrElse("c", "0.0")
          .split(",").map(_.trim.toDouble).toSeq

        def emit(classified: org.apache.spark.sql.Dataset[ClassifiedRead],
            outPath: String): Unit = {
          val cached = classified
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          IndexOps.writePerSampleOutput(cached, sampleRegex, outPath)
          // one kreport per sample when a regex is given, plus the overall
          // report on stdout (reference Classifier.scala:229-251)
          if (opts.contains("sample-regex"))
            IndexOps.writePerSampleReports(cached, sampleRegex,
              outPath + "_reports", bcTax)
          ClassifyKernel.report(cached, bcTax).lines.foreach(println)
          cached.unpersist()
        }

        if (params.m > 32) {
          // wide (m>32) and narrow share the span protocol and ClassifyKernel,
          // so per-read output, paired-end and confidence work at any m
          val wide = new WideMinimizerIndex(params.k, params.m, bcTax)
          val records = wide.loadRecords(spark, idxPath, params.buckets)
          val spans = wide.spans(loadReads(spark, opts))
          if (confs.length > 1)
            // one join+regroup for the whole sweep, same as the narrow path;
            // detail=true: per-read output needs the hit strings
            wide.classifyMultiThresholdDF(spans.toDF(), records, confs,
                minHitGroups, detail = true) { results =>
              for ((conf, ds) <- results) {
                println(s"== confidence $conf ==")
                emit(ds, s"${opts("output")}/c$conf")
              }
            }
          else
            emit(wide.classify(spans, records, confs.head, minHitGroups),
              opts("output"))
        } else {
          val (index, records) = MinimizerIndex.open(spark, idxPath, bcTax)
          val spans = index.spans(loadReads(spark, opts))
          if (confs.length > 1)
            // one join+regroup for the whole sweep (cached hit dataset);
            // detail=true: per-read output needs the hit strings
            index.classifyMultiThreshold(spans, records, confs, minHitGroups,
                detail = true) {
              results =>
                for ((conf, ds) <- results) {
                  println(s"== confidence $conf ==")
                  emit(ds, s"${opts("output")}/c$conf")
                }
            }
          else
            emit(index.classify(spans, records, confs.head, minHitGroups),
              opts("output"))
        }

      case "classify2" =>
        val idxPath = opts("index")
        val spark = session(buckets)
        val params = IndexParams.read(spark, idxPath)
        spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
        val tax = loadTaxonomy(spark, opts.getOrElse("taxonomy", idxPath + "/taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        // the 2-step pipeline is width-generic: pick the index by stored m
        val (idx: KeyedIndex, records) =
          if (params.m > 32) {
            val w = new WideMinimizerIndex(params.k, params.m, bcTax)
            (w, w.loadRecords(spark, idxPath, params.buckets))
          } else
            MinimizerIndex.open(spark, idxPath, bcTax)
        val dyn = new DynamicClassifier(idx, bcTax)
        val (classified, selected, subLib, dynRecords) = dyn.classify2Full(
          loadReads(spark, opts), loadLibrary(spark, opts), records,
          rank = opts.getOrElse("rank", "species"),
          threshold = opts.getOrElse("threshold", "100").toLong)
        println(s"selected ${selected.size} taxa")
        IndexOps.writePerSampleOutput(classified,
          opts.getOrElse("sample-regex", "^(.*)$"), opts("output"))
        // optional bracken weights against the DYNAMIC sub-index (reference
        // Dynamic.scala:339-344): tailored to the selected-taxa set
        for (rl <- opts.get("bracken-read-len")) {
          val bracken = new Bracken(idx, bcTax)
          bracken.weightLines(dyn.dynamicWeights(subLib, dynRecords, rl.toInt))
            .write.option("sep", "\t").mode("overwrite")
            .csv(opts("output") + "_weights")
        }

      case "bracken" =>
        val idxPath = opts("index")
        val spark = session(buckets)
        val params = IndexParams.read(spark, idxPath)
        spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
        val tax = loadTaxonomy(spark, opts.getOrElse("taxonomy", idxPath + "/taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        // bracken weights are width-generic: pick the index by stored m
        val (idx: KeyedIndex, records) =
          if (params.m > 32) {
            val w = new WideMinimizerIndex(params.k, params.m, bcTax)
            (w, w.loadRecords(spark, idxPath, params.buckets))
          } else
            MinimizerIndex.open(spark, idxPath, bcTax)
        val bracken = new Bracken(idx, bcTax)
        val w = bracken.weights(loadLibrary(spark, opts), records,
          readLen = opts.getOrElse("read-len", "100").toInt)
        bracken.weightLines(w).write.option("sep", "\t").mode("overwrite")
          .csv(opts("output"))

      case "compare" =>
        // classification accuracy vs a reference mapping (spec: reference
        // analysis/MappingComparison.scala): per-read categories at a rank
        // + PPV/sensitivity
        val spark = session(buckets)
        import spark.implicits._
        val tax = loadTaxonomy(spark, opts("taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        val classified = MappingComparison
          .readKrakenOutput(spark, opts("classified"))
          .as[(String, Int)]
          .map { case (title, taxon) =>
            ClassifiedRead(title, taxon != Taxonomy.NONE, taxon, 0, "")
          }
        val truth = Sequences.labels(spark, opts("truth"))
          .toDF("title", "taxon")
        val rank = opts.getOrElse("rank", "species")
        val categories = MappingComparison
          .categorize(classified, truth, bcTax, rank)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        for (out <- opts.get("output"))
          categories.write.option("sep", "\t").mode("overwrite").csv(out)
        MappingComparison.readMetrics(categories).show()
        val (precision, recall, det, tru) =
          MappingComparison.taxonMetrics(classified, truth, bcTax, rank)
        println(f"taxon precision=$precision%.4f recall=$recall%.4f " +
          s"detected=${det.size} truth=${tru.size}")
        categories.unpersist()

      case "stats" =>
        val idxPath = opts("index")
        val spark = session(buckets)
        val params = IndexParams.read(spark, idxPath)
        spark.conf.set("spark.sql.shuffle.partitions", params.buckets.toString)
        val tax = loadTaxonomy(spark, opts.getOrElse("taxonomy", idxPath + "/taxonomy"))
        val bcTax = spark.sparkContext.broadcast(tax)
        // taxon-side statistics are width-agnostic; only respace is narrow
        var records =
          if (params.m > 32)
            new WideMinimizerIndex(params.k, params.m, bcTax)
              .loadRecords(spark, idxPath, params.buckets)
          else MinimizerIndex.loadRecords(spark, idxPath, params.buckets)
        for (s <- opts.get("respace")) {
          require(params.m <= 32, "respace applies to narrow (m<=32) indexes")
          records = IndexOps.respace(records, params, s.toInt, bcTax)
        }
        // memoize per-taxon counts beside the index unless respaced (counts
        // of a respaced view differ from the stored index's)
        val perTaxon =
          if (opts.contains("respace")) IndexOps.minimizersPerTaxon(records)
          else IndexOps.minimizersPerTaxonMemo(records, idxPath)
        perTaxon.write.option("sep", "\t").mode("overwrite").csv(opts("output"))
        IndexOps.depthHistogram(records, bcTax).show(50)

      case other =>
        System.err.println(s"unknown command: $other")
        sys.exit(2)
    }
  }
}
