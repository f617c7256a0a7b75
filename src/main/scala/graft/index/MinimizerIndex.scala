package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.kmers._
import graft.sources.InputFragment
import graft.taxa.{Sentinels, Taxonomy}

/** Index construction parameters, persisted as a sidecar next to the records
  * (spec: reference kmers/IndexParams.scala). Defaults are Kraken 2's. */
final case class IndexParams(
    k: Int = 35,
    m: Int = 31,
    spaces: Int = 7,
    canonical: Boolean = true,
    xorMask: Long = RandomXorPriority.DEFAULT_MASK,
    buckets: Int = 32,
    demoted: Option[Array[Long]] = None,
    /** Record count, stamped by the CLI build (which counts anyway to report
      * it): lets classify pick the in-memory zero-shuffle path with no extra
      * job. None for indexes written before the field existed, or derived
      * ones whose count was not re-measured. */
    records: Option[Long] = None) {

  def priority: MinimizerPriority = {
    val base = RandomXorPriority(m, xorMask, canonical)
    val spaced = if (spaces > 0) SpacedSeedPriority(spaces, base) else base
    // frequency ordering: the sampled most-frequent m-mers sort after all
    // others (see FrequencyPriority) — the demotion wraps the spaced/XOR
    // ordering so within each class the base ordering breaks ties
    demoted match {
      case Some(d) => FrequencyPriority(d, spaced)
      case None => spaced
    }
  }

  def scanner: SupermerScanner = new SupermerScanner(k, priority)
}

/** A classification-time span: a super-mer stripped of sequence payload
  * (spec: reference slacken/package.scala:41-62).
  * @param id1      minimizer priority (join key)
  * @param distinct minimizer differs from the previous valid span's (feeds the
  *                 Kraken 2 minimum-hit-groups rule)
  * @param kmers    number of k-mers in the span
  * @param flag     SEQUENCE=1 / AMBIGUOUS=2 / MATE_PAIR_BORDER=3
  * @param ordinal  position of the span within its read (order reconstruction
  *                 after shuffles)
  * @param seqLen   total fragment length (constant per title)
  */
final case class OrdinalSpan(
    id1: Long, distinct: Boolean, kmers: Int, flag: Int, ordinal: Int,
    title: String, seqLen: Int)

/** A span joined to the index: resolved LCA taxon + k-mer count. */
final case class TaxonHit(ordinal: Int, taxon: Int, kmers: Int, distinct: Boolean)

/** Kraken-compatible per-read classification result. */
final case class ClassifiedRead(
    title: String, classified: Boolean, taxon: Int, length: Int, hits: String) {
  def outputLine: String =
    s"${if (classified) "C" else "U"}\t$title\t$taxon\t$length\t$hits"
}

/** The minimizer -> LCA-taxon key-value index and the classification pipeline
  * over it (spec: reference slacken/KeyValueIndex.scala, Classifier.scala —
  * re-architected: single-Long minimizer keys for m<=32, depth-based LCA,
  * no k-mer payload ever shuffled).
  *
  * Scale design:
  *  - records are bucketed by id1 so every classification join is a
  *    one-sided shuffle (only the read spans move);
  *  - the LCA groupBy gets map-side partial aggregation from the Aggregator;
  *  - ambiguous spans carry random minimizers for load balance;
  *  - the taxonomy is a broadcast array structure, never a join.
  */
final class MinimizerIndex(params: IndexParams, bcTax: Broadcast[Taxonomy])
    extends KeyedIndex {

  import Sentinels._

  def paramsOf: IndexParams = params
  override def taxonomyOf: Broadcast[Taxonomy] = bcTax

  // ---------------- KeyedIndex (width-independent face) ----------------

  override def keyCols: Seq[String] = Seq("id1")

  override def kOf: Int = params.k

  // one scanner per deserialized index instance (per task), not per call:
  // scanKeyed runs once per ambiguity run inside per-fragment hot loops
  @transient private lazy val sharedScanner = params.scanner

  override def scanKeyed(segment: CharSequence): Iterator[KeyedSupermer] =
    sharedScanner.scan(segment)
      .map(sm => KeyedSupermer(sm.minimizer, 0L, sm.start, sm.kmers))

  override def spansDF(reads: Dataset[InputFragment]): DataFrame =
    spans(reads).toDF()

  override def buildRecords(library: Dataset[(Int, String)]): DataFrame =
    makeRecords(library)

  override def buildLeafPairs(library: Dataset[(Int, String)]): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val scanner = params.scanner
    val kk = params.k
    val tax = bcTax
    library.flatMap { case (taxon, seq) =>
      // same validity gate as makeRecords: undefined label taxa contribute
      // no pairs (no silent ROOT lift)
      if (!tax.value.isDefined(taxon)) Iterator.empty
      else SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
        if (!run.valid || run.seq.length < kk) Iterator.empty
        else scanner.scan(run.seq).map(sm => (sm.minimizer, taxon))
      }
    }.toDF("id1", "taxon").distinct()
  }

  override def foldLeafPairs(pairs: DataFrame, extraCols: Seq[String] = Nil)
      : DataFrame = {
    val spark = pairs.sparkSession
    val lcaName = graft.taxa.LcaAggregate.register(spark, bcTax)
    pairs.groupBy((extraCols ++ keyCols).map(col): _*)
      .agg(graft.taxa.LcaAggregate.lcaAgg(lcaName, col("taxon")).as("taxon"))
  }

  override def classifyDF(spans: DataFrame, records: DataFrame,
      confidence: Double = 0.0, minHitGroups: Int = 2): Dataset[ClassifiedRead] =
    ClassifyKernel.resolve(
      ClassifyKernel.group(spans.join(records, keyCols, "left")),
      bcTax, confidence, minHitGroups)

  override def timedSpanMass(reads: Dataset[(java.sql.Timestamp, InputFragment)])
      : DataFrame = {
    val spark = reads.sparkSession
    import spark.implicits._
    reads.mapPartitions { it =>
      val scanner = params.scanner
      it.flatMap { case (ts, f) =>
        fragmentSpans(f, scanner).map(s => (ts, s.id1, s.kmers))
      }
    }.toDF("ts", "id1", "kmers")
  }

  // ---------------- span extraction (executor-local kernel) ----------------

  /** Split one fragment into ordinal spans: valid segments through the
    * supermer scanner; ambiguous segments (len >= k) as single pseudo-spans
    * with random minimizers; a border sentinel between mates. */
  def fragmentSpans(f: InputFragment): Iterator[OrdinalSpan] =
    fragmentSpans(f, params.scanner)

  def fragmentSpans(f: InputFragment, scanner: SupermerScanner): Iterator[OrdinalSpan] = {
    val k = params.k
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val totalLen = f.nucleotides.length + f.nucleotides2.map(_.length).getOrElse(0)

    def segSpans(seq: String): Iterator[(Long, Int, Int)] =
      SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
        if (run.seq.length < k) Iterator.empty
        else if (run.valid)
          scanner.scan(run.seq).map(sm => (sm.minimizer, sm.kmers, SEQUENCE_FLAG))
        else
          Iterator((rnd.nextLong(), run.seq.length - (k - 1), AMBIGUOUS_FLAG))
      }

    val all: Iterator[(Long, Int, Int)] = f.nucleotides2 match {
      case Some(nt2) =>
        segSpans(f.nucleotides) ++
          Iterator((rnd.nextLong(), 0, MATE_PAIR_BORDER_FLAG)) ++ segSpans(nt2)
      case None => segSpans(f.nucleotides)
    }

    var last = 0L
    var first = true
    all.zipWithIndex.map { case ((min, kmers, flag), ordinal) =>
      val isSeq = flag == SEQUENCE_FLAG
      val distinct = isSeq && (first || min != last)
      if (isSeq) { last = min; first = false }
      OrdinalSpan(min, distinct, kmers, flag, ordinal, f.header, totalLen)
    }
  }

  def spans(reads: Dataset[InputFragment]): Dataset[OrdinalSpan] = {
    val spark = reads.sparkSession
    import spark.implicits._
    reads.mapPartitions { it =>
      // one scanner per task, not per fragment
      val scanner = params.scanner
      it.flatMap(f => fragmentSpans(f, scanner))
    }
  }

  // ---------------- index build ----------------

  /** Build index records from a labeled genome library:
    * flatMap minimizers -> groupBy(id1) -> LCA fold (partial agg map-side).
    *
    * @param saltBuckets optional skew hardening for 100 TB libraries:
    *   low-complexity DNA concentrates a few minimizers into giant groups;
    *   with salting the fold runs in two stages — groupBy(id1, salt) then
    *   groupBy(id1) — which is legal because LCA is associative and
    *   commutative (SURVEY §7.4 risk 5). 0 = single-stage (default).
    */
  def makeRecords(library: Dataset[(Int, String)], saltBuckets: Int = 0): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val scanner = params.scanner
    val k = params.k
    // native TypedImperativeAggregate: Int buffer, no Encoder roundtrip
    // (the Aggregator-based TaxonLcaAggregator remains as the documented
    // user-level API; both fold with the same broadcast LCA)
    val lcaName = graft.taxa.LcaAggregate.register(spark, bcTax)
    val lcaAgg = (c: org.apache.spark.sql.Column) =>
      graft.taxa.LcaAggregate.lcaAgg(lcaName, c)
    val tax = bcTax
    val pairs = library
      .flatMap { case (taxon, seq) =>
        // validity gate (spec: reference slacken/KeyValueIndex.scala:105-121):
        // a label taxon absent from the taxonomy (stale seqid2taxid entry)
        // contributes NO records — without this, its minimizers would fold to
        // ROOT and silently degrade every shared minimizer's LCA
        if (!tax.value.isDefined(taxon)) Iterator.empty
        else SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
          if (!run.valid || run.seq.length < k) Iterator.empty
          else scanner.scan(run.seq).map(sm => (sm.minimizer, taxon))
        }
      }
      .toDF("id1", "taxon")
    foldRecords(pairs, lcaAgg, saltBuckets)
  }

  /** The LCA fold: groupBy(id1), optionally in two salted stages (legal
    * because LCA is associative and commutative). */
  private def foldRecords(pairs: DataFrame,
      lcaAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      saltBuckets: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    if (saltBuckets <= 0)
      pairs.groupBy($"id1").agg(lcaAgg($"taxon").as("taxon"))
    else
      pairs
        .withColumn("salt", pmod(hash($"taxon"), lit(saltBuckets)))
        .groupBy($"id1", $"salt").agg(lcaAgg($"taxon").as("taxon"))
        .groupBy($"id1").agg(lcaAgg($"taxon").as("taxon"))
  }

  /** Split a string library into 2-bit packed valid runs: (taxon, packed
    * bytes, base length). Ambiguous runs and runs shorter than k contribute
    * no k-mers and are dropped here. Pack BEFORE any wide transformation
    * (label join, repartition) so genome payloads move at 2 bits/base
    * instead of UTF-8 text (spec: reference NTBitArray library payload). */
  def packLibrary(library: Dataset[(Int, String)]): Dataset[(Int, Array[Byte], Int)] = {
    val spark = library.sparkSession
    import spark.implicits._
    val kk = params.k
    library.flatMap { case (taxon, seq) =>
      SupermerScanner.splitByAmbiguity(seq).collect {
        case run if run.valid && run.seq.length >= kk =>
          (taxon, Dna.pack2bit(run.seq), run.seq.length)
      }
    }
  }

  /** [[makeRecords]] over a 2-bit packed library (see [[packLibrary]]):
    * identical records, but the scan reads the packed bytes through a
    * zero-copy view — no unpacked string is ever materialized. */
  def makeRecordsPacked(library: Dataset[(Int, Array[Byte], Int)],
      saltBuckets: Int = 0): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val scanner = params.scanner
    val lcaName = graft.taxa.LcaAggregate.register(spark, bcTax)
    val lcaAgg = (c: org.apache.spark.sql.Column) =>
      graft.taxa.LcaAggregate.lcaAgg(lcaName, c)
    val tax = bcTax
    val pairs = library
      .flatMap { case (taxon, packed, len) =>
        if (!tax.value.isDefined(taxon)) Iterator.empty
        else scanner.scan(new Dna.Packed(packed, len))
          .map(sm => (sm.minimizer, taxon))
      }
      .toDF("id1", "taxon")
    foldRecords(pairs, lcaAgg, saltBuckets)
  }

  // ---------------- classification ----------------

  /** Join spans against records (left; the bucketed record side does not
    * shuffle), then the shared kernel: sentinel projection, per-read regroup,
    * LCA resolution. */
  def classify(spans: Dataset[OrdinalSpan], records: DataFrame,
      confidence: Double = 0.0, minHitGroups: Int = 2): Dataset[ClassifiedRead] =
    ClassifyKernel.resolve(
      ClassifyKernel.group(spans.join(records, Seq("id1"), "left")),
      bcTax, confidence, minHitGroups)

  /** Classification as a pure map — ZERO shuffles: collect the records into
    * an open-addressing [[LongTaxonMap]], broadcast it, and scan + lookup +
    * resolve every read inside ONE mapPartitions (spans of a read are
    * generated contiguously and already ordinal-ordered, so no regroup is
    * needed). This is the reference tool family's resident-hash-table
    * execution model expressed in Spark; use it when the index fits
    * driver/executor memory — [[classify]]'s one-sided bucketed join remains
    * the scale path when it does not. Output is row-identical to
    * [[classify]] (shared [[ClassifyKernel]] semantics). */
  override def inMemoryClassifier(records: DataFrame): InMemoryClassifier = {
    val spark = records.sparkSession
    import spark.implicits._
    val table = LongTaxonMap(
      records.select(col("id1"), col("taxon")).as[(Long, Int)].collect())
    val bc = spark.sparkContext.broadcast(table)
    val p = params
    val tax = bcTax
    val outer = this
    new InMemoryClassifier {
      override def tableBytes: Long = table.byteSize
      override def close(): Unit = bc.destroy()

      private def fragHits(f: InputFragment,
          scanner: SupermerScanner, tbl: LongTaxonMap): Vector[TaxonHit] =
        outer.fragmentSpans(f, scanner).map { s =>
          val t = s.flag match {
            case AMBIGUOUS_FLAG => AMBIGUOUS_SPAN
            case MATE_PAIR_BORDER_FLAG => MATE_PAIR_BORDER
            case _ => tbl.get(s.id1)
          }
          TaxonHit(s.ordinal, t, s.kmers, s.distinct)
        }.toVector

      def classify(reads: Dataset[InputFragment], confidence: Double,
          minHitGroups: Int, detail: Boolean): Dataset[ClassifiedRead] = {
        val session = reads.sparkSession
        import session.implicits._
        reads.mapPartitions { it =>
          val scanner = p.scanner
          val resolver = new graft.taxa.LcaResolver(tax.value)
          val tbl = bc.value
          it.flatMap { f =>
            val hits = fragHits(f, scanner, tbl)
            // a read with no spans has no group row in the join path either
            if (hits.isEmpty) None
            else {
              val seqLen = f.nucleotides.length +
                f.nucleotides2.map(_.length).getOrElse(0)
              Some(ClassifyKernel.resolveLocal(f.header, hits, seqLen,
                resolver, confidence, minHitGroups, detail))
            }
          }
        }
      }

      def classifySweep(reads: Dataset[InputFragment],
          confidences: Seq[Double], minHitGroups: Int, detail: Boolean)
          : Dataset[(Double, ClassifiedRead)] = {
        val session = reads.sparkSession
        import session.implicits._
        reads.mapPartitions { it =>
          val scanner = p.scanner
          val resolver = new graft.taxa.LcaResolver(tax.value)
          val tbl = bc.value
          it.flatMap { f =>
            val hits = fragHits(f, scanner, tbl)
            if (hits.isEmpty) Iterator.empty
            else {
              val seqLen = f.nucleotides.length +
                f.nucleotides2.map(_.length).getOrElse(0)
              confidences.iterator.map(c => c -> ClassifyKernel.resolveLocal(
                f.header, hits, seqLen, resolver, c, minHitGroups, detail))
            }
          }
        }
      }
    }
  }

  /** Classify at several confidence thresholds, computing the expensive
    * join+regroup ONCE and reusing the cached per-read hit dataset for every
    * threshold (spec: R4 multi-threshold sweep, Classifier.scala:156-170).
    * Loan pattern: the cached hit dataset lives exactly as long as `use`
    * runs — it is unpersisted on the way out, so sweeps cannot leak cache. */
  def classifyMultiThreshold[T](spans: Dataset[OrdinalSpan], records: DataFrame,
      confidences: Seq[Double], minHitGroups: Int = 2, detail: Boolean = true)
      (use: Seq[(Double, Dataset[ClassifiedRead])] => T): T = {
    val grouped = ClassifyKernel.group(spans.join(records, Seq("id1"), "left"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try use(confidences.map { conf =>
      conf -> ClassifyKernel.resolve(grouped, bcTax, conf, minHitGroups, detail)
    })
    finally grouped.unpersist(blocking = false)
  }

  // ---------------- persistence (bucketed parquet) ----------------

  /** Persist records bucketed by id1 so classification joins never shuffle
    * the index side (spec: reference KeyValueIndex.scala:125-159). */
  def writeRecords(records: DataFrame, path: String): Unit = {
    val spark = records.sparkSession
    val table = MinimizerIndex.tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    records.write
      .bucketBy(params.buckets, "id1")
      .sortBy("id1")
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
    IndexParams.write(spark, params, path)
  }

  /** Reopen bucketed records via DDL (bucket metadata makes the sort-merge
    * join one-sided; shuffle.partitions should equal `buckets`). */
  def loadRecords(spark: SparkSession, path: String): DataFrame =
    MinimizerIndex.loadRecords(spark, path, params.buckets)

  // ---------------- reports ----------------

  /** Per-taxon read counts -> Kraken-style report rows, driver-side
    * (clade aggregation; spec: reference slacken/KrakenReport.scala). */
  def report(classified: Dataset[ClassifiedRead]): KrakenReport =
    ClassifyKernel.report(classified, bcTax)
}

object MinimizerIndex {

  def tableName(path: String): String =
    "graft_idx_" + Integer.toHexString(path.hashCode).replace('-', '_')

  def loadRecords(spark: SparkSession, path: String, buckets: Int): DataFrame = {
    val table = tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (id1 BIGINT, taxon INT)
         |USING PARQUET
         |CLUSTERED BY (id1) SORTED BY (id1) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    spark.table(table)
  }

  /** Load an index (records + params sidecar) from a path. */
  def open(spark: SparkSession, path: String, bcTax: Broadcast[Taxonomy])
      : (MinimizerIndex, DataFrame) = {
    val params = IndexParams.read(spark, path)
    val idx = new MinimizerIndex(params, bcTax)
    (idx, idx.loadRecords(spark, path))
  }
}

object IndexParams {
  import org.apache.hadoop.fs.Path

  /** @param writeDemotionSidecar false when re-stamping properties for an
    *   index whose demotion sidecar is already on disk (skips the redundant
    *   second write of the demoted array). */
  def write(spark: SparkSession, p: IndexParams, indexPath: String,
      writeDemotionSidecar: Boolean = true): Unit = {
    val props = new java.util.Properties()
    props.setProperty("k", p.k.toString)
    props.setProperty("m", p.m.toString)
    props.setProperty("spaces", p.spaces.toString)
    props.setProperty("canonical", p.canonical.toString)
    props.setProperty("xorMask", java.lang.Long.toHexString(p.xorMask))
    props.setProperty("buckets", p.buckets.toString)
    props.setProperty("ordering", if (p.demoted.isDefined) "frequency" else "xor")
    for (n <- p.records) props.setProperty("records", n.toString)
    val path = new Path(indexPath, "_index.properties")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try props.store(out, "graft index parameters") finally out.close()
    // the demotion set travels with the index: classify-time scans must
    // reproduce the exact build-time ordering or keys will not match
    if (writeDemotionSidecar)
      for (d <- p.demoted) FrequencyOrdering.write(spark, indexPath, d)
  }

  def read(spark: SparkSession, indexPath: String): IndexParams = {
    val path = new Path(indexPath, "_index.properties")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    val demoted =
      if (props.getProperty("ordering", "xor") == "frequency")
        Some(FrequencyOrdering.read(spark, indexPath))
      else None
    IndexParams(
      k = props.getProperty("k").toInt,
      m = props.getProperty("m").toInt,
      spaces = props.getProperty("spaces").toInt,
      canonical = props.getProperty("canonical").toBoolean,
      xorMask = java.lang.Long.parseUnsignedLong(props.getProperty("xorMask"), 16),
      buckets = props.getProperty("buckets").toInt,
      demoted = demoted,
      records = Option(props.getProperty("records")).map(_.toLong))
  }
}

/** Driver-side Kraken-style hierarchical report: clade-aggregated counts,
  * DFS print with children ordered by clade count. */
final class KrakenReport(tax: Taxonomy, taxonCounts: Array[(Int, Long)]) {

  val countMap: Map[Int, Long] = taxonCounts.toMap
  val totalReads: Long = taxonCounts.map(_._2).sum
  val unclassified: Long = countMap.getOrElse(Taxonomy.NONE, 0L)

  /** Count per clade: own count + all descendants (computed by walking each
    * counted taxon's root path once). */
  val cladeCounts: Map[Int, Long] = {
    val m = collection.mutable.Map.empty[Int, Long]
    for ((t, c) <- taxonCounts if t != Taxonomy.NONE) {
      var cur = t
      while (cur != Taxonomy.NONE) {
        m(cur) = m.getOrElse(cur, 0L) + c
        cur = tax.parents(cur)
      }
    }
    m.toMap
  }

  def lines: Iterator[String] = {
    val sb = collection.mutable.ArrayBuffer.empty[String]
    def pct(c: Long): String =
      if (totalReads == 0) "0.00" else f"${100.0 * c / totalReads}%.2f"
    def primaryCode(t: Int): Option[String] = tax.rankName(t) match {
      case "superkingdom" => Some("D")
      case "kingdom" => Some("K")
      case "phylum" => Some("P")
      case "class" => Some("C")
      case "order" => Some("O")
      case "family" => Some("F")
      case "genus" => Some("G")
      case "species" => Some("S")
      case _ => None
    }
    if (unclassified > 0)
      sb += s"${pct(unclassified)}\t$unclassified\t$unclassified\tU\t0\tunclassified"
    // sub-rank protocol (spec: reference KrakenReport.scala:72-99, from
    // kraken 2's reports.cc): a ranked taxon emits its own code at depth 0;
    // an unranked taxon inherits the nearest ranked ancestor's code with the
    // number of steps below it, e.g. G1, S2. Root itself prints as R.
    def dfs(t: Int, depth: Int, inheritedCode: String, rankDepth: Int): Unit = {
      val clade = cladeCounts.getOrElse(t, 0L)
      if (clade > 0) {
        val (code, rd) = primaryCode(t) match {
          case Some(c) => (c, 0)
          case None if t == Taxonomy.ROOT => ("R", 0)
          case None => (inheritedCode, rankDepth + 1)
        }
        val codeStr = if (rd == 0) code else s"$code$rd"
        val own = countMap.getOrElse(t, 0L)
        val name = Option(tax.names(t)).getOrElse(s"taxid $t")
        sb += s"${pct(clade)}\t$clade\t$own\t$codeStr\t$t\t${"  " * depth}$name"
        for (c <- tax.children(t).sortBy(c => -cladeCounts.getOrElse(c, 0L)))
          dfs(c, depth + 1, code, rd)
      }
    }
    dfs(Taxonomy.ROOT, 0, "R", 0)
    sb.iterator
  }

  def render: String = lines.mkString("\n")
}
