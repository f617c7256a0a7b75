package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kmers.{SupermerScanner, WideRandomXorPriority, WideSupermerScanner}
import graft.sources.InputFragment
import graft.taxa.{Sentinels, Taxonomy}

/** A wide classification-time span: same ordinal/flag/mate protocol as
  * [[OrdinalSpan]], with the minimizer as two longs (id1 = high word). */
final case class WideOrdinalSpan(
    id1: Long, id2: Long, distinct: Boolean, kmers: Int, flag: Int,
    ordinal: Int, title: String, seqLen: Int)

/** Wide-minimizer index (m in [33, 64]): records carry two key columns
  * (id1, id2) — the reference's idLongs = ceil(m/32) column scheme
  * (KmerKeyedIndex.scala:27-55) at width 2. The reference treats key width
  * uniformly; here only the key columns differ from [[MinimizerIndex]] —
  * span extraction carries the identical ordinal/flag/mate-border protocol
  * and classification shares [[ClassifyKernel]], so per-read output,
  * paired-end reads and confidence thresholds all work at any m.
  * Joins/groupBys run on primitive long column pairs so Tungsten hashing
  * stays allocation-free.
  */
final class WideMinimizerIndex(k: Int, m: Int, bcTax: Broadcast[Taxonomy],
    spaces: Int = 0, demoted: Array[Long] = Array.emptyLongArray)
    extends KeyedIndex {

  import Sentinels._

  val scanner = new WideSupermerScanner(k,
    new WideRandomXorPriority(m, spaces = spaces, demoted = demoted))

  // ---------------- KeyedIndex (width-independent face) ----------------

  override def keyCols: Seq[String] = Seq("id1", "id2")

  override def kOf: Int = k

  override def scanKeyed(segment: CharSequence): Iterator[KeyedSupermer] =
    scanner.scan(segment)
      .map(sm => KeyedSupermer(sm.minHi, sm.minLo, sm.start, sm.kmers))

  override def taxonomyOf: Broadcast[Taxonomy] = bcTax

  override def spansDF(reads: Dataset[InputFragment]): DataFrame =
    spans(reads).toDF()

  override def buildRecords(library: Dataset[(Int, String)]): DataFrame =
    makeRecords(library)

  override def buildLeafPairs(library: Dataset[(Int, String)]): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val sc = scanner
    val kk = k
    val tax = bcTax
    library.flatMap { case (taxon, seq) =>
      if (!tax.value.isDefined(taxon)) Iterator.empty
      else SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
        if (!run.valid || run.seq.length < kk) Iterator.empty
        else sc.scan(run.seq).map(sm => (sm.minHi, sm.minLo, taxon))
      }
    }.toDF("id1", "id2", "taxon").distinct()
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
    val sc = scanner
    reads.mapPartitions { it =>
      it.flatMap { case (ts, f) =>
        fragmentSpans(f, sc).map(s => (ts, s.id1, s.id2, s.kmers))
      }
    }.toDF("ts", "id1", "id2", "kmers")
  }

  /** @param saltBuckets optional two-stage skew hardening, as in
    *   [[MinimizerIndex.makeRecords]] (legal: LCA is associative+commutative). */
  def makeRecords(library: Dataset[(Int, String)], saltBuckets: Int = 0): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val sc = scanner
    val kk = k
    val tax = bcTax
    val pairs = library.flatMap { case (taxon, seq) =>
      // same validity gate as the narrow build: undefined label taxa
      // contribute no records (no silent ROOT lift)
      if (!tax.value.isDefined(taxon)) Iterator.empty
      else SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
        if (!run.valid || run.seq.length < kk) Iterator.empty
        else sc.scan(run.seq).map(sm => (sm.minHi, sm.minLo, taxon))
      }
    }.toDF("id1", "id2", "taxon")
    foldRecords(pairs, saltBuckets)
  }

  /** [[makeRecords]] over a 2-bit packed library (see
    * [[MinimizerIndex.packLibrary]]): identical records, but the scan reads
    * the packed bytes through a zero-copy view — genome payloads move at
    * 2 bits/base wherever the library shuffles. */
  def makeRecordsPacked(library: Dataset[(Int, Array[Byte], Int)],
      saltBuckets: Int = 0): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val sc = scanner
    val tax = bcTax
    val pairs = library.flatMap { case (taxon, packed, len) =>
      if (!tax.value.isDefined(taxon)) Iterator.empty
      else sc.scan(new graft.kmers.Dna.Packed(packed, len))
        .map(sm => (sm.minHi, sm.minLo, taxon))
    }.toDF("id1", "id2", "taxon")
    foldRecords(pairs, saltBuckets)
  }

  /** The two-long LCA fold, optionally two-stage salted. Uses the native
    * TypedImperativeAggregate (Int buffer, map-side combine), same as the
    * narrow build path. */
  private def foldRecords(pairs: DataFrame, saltBuckets: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val lcaName = graft.taxa.LcaAggregate.register(spark, bcTax)
    val lcaAgg = (c: org.apache.spark.sql.Column) =>
      graft.taxa.LcaAggregate.lcaAgg(lcaName, c)
    if (saltBuckets <= 0)
      pairs.groupBy($"id1", $"id2").agg(lcaAgg($"taxon").as("taxon"))
    else
      pairs
        .withColumn("salt", pmod(hash($"taxon"), lit(saltBuckets)))
        .groupBy($"id1", $"id2", $"salt").agg(lcaAgg($"taxon").as("taxon"))
        .groupBy($"id1", $"id2").agg(lcaAgg($"taxon").as("taxon"))
  }

  // ---------------- span extraction (executor-local kernel) ----------------

  /** Split one fragment into wide ordinal spans: valid segments through the
    * wide scanner; ambiguous segments (len >= k) as single pseudo-spans with
    * random keys; a border sentinel between mates — the same protocol as
    * [[MinimizerIndex.fragmentSpans]]. */
  def fragmentSpans(f: InputFragment, sc: WideSupermerScanner)
      : Iterator[WideOrdinalSpan] = {
    val kk = k
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val totalLen = f.nucleotides.length + f.nucleotides2.map(_.length).getOrElse(0)

    def segSpans(seq: String): Iterator[(Long, Long, Int, Int)] =
      SupermerScanner.splitByAmbiguity(seq).flatMap { run =>
        if (run.seq.length < kk) Iterator.empty
        else if (run.valid)
          sc.scan(run.seq).map(sm => (sm.minHi, sm.minLo, sm.kmers, SEQUENCE_FLAG))
        else
          Iterator((rnd.nextLong(), rnd.nextLong(),
            run.seq.length - (kk - 1), AMBIGUOUS_FLAG))
      }

    val all: Iterator[(Long, Long, Int, Int)] = f.nucleotides2 match {
      case Some(nt2) =>
        segSpans(f.nucleotides) ++
          Iterator((rnd.nextLong(), rnd.nextLong(), 0, MATE_PAIR_BORDER_FLAG)) ++
          segSpans(nt2)
      case None => segSpans(f.nucleotides)
    }

    var lastHi = 0L
    var lastLo = 0L
    var first = true
    all.zipWithIndex.map { case ((hi, lo, kmers, flag), ordinal) =>
      val isSeq = flag == SEQUENCE_FLAG
      val distinct = isSeq && (first || hi != lastHi || lo != lastLo)
      if (isSeq) { lastHi = hi; lastLo = lo; first = false }
      WideOrdinalSpan(hi, lo, distinct, kmers, flag, ordinal, f.header, totalLen)
    }
  }

  def spans(reads: Dataset[InputFragment]): Dataset[WideOrdinalSpan] = {
    val spark = reads.sparkSession
    import spark.implicits._
    val sc = scanner
    reads.mapPartitions(it => it.flatMap(f => fragmentSpans(f, sc)))
  }

  // ---------------- classification ----------------

  /** Per-read classification: join on the two-long key (left; the bucketed
    * record side does not shuffle), then the shared kernel. */
  def classify(spans: Dataset[WideOrdinalSpan], records: DataFrame,
      confidence: Double = 0.0, minHitGroups: Int = 2): Dataset[ClassifiedRead] =
    ClassifyKernel.resolve(
      ClassifyKernel.group(spans.join(records, Seq("id1", "id2"), "left")),
      bcTax, confidence, minHitGroups)

  /** Zero-shuffle classifier with a broadcast two-long-key table — see
    * [[MinimizerIndex.inMemoryClassifier]]; identical design at wide width. */
  override def inMemoryClassifier(records: DataFrame): InMemoryClassifier = {
    val spark = records.sparkSession
    import spark.implicits._
    val table = WideTaxonMap(records.select(col("id1"), col("id2"), col("taxon"))
      .as[(Long, Long, Int)].collect())
    val bc = spark.sparkContext.broadcast(table)
    val sc = scanner
    val tax = bcTax
    val outer = this
    new InMemoryClassifier {
      override def tableBytes: Long = table.byteSize
      override def close(): Unit = bc.destroy()

      private def fragHits(f: InputFragment, tbl: WideTaxonMap): Vector[TaxonHit] =
        outer.fragmentSpans(f, sc).map { s =>
          val t = s.flag match {
            case AMBIGUOUS_FLAG => AMBIGUOUS_SPAN
            case MATE_PAIR_BORDER_FLAG => MATE_PAIR_BORDER
            case _ => tbl.get(s.id1, s.id2)
          }
          TaxonHit(s.ordinal, t, s.kmers, s.distinct)
        }.toVector

      def classify(reads: Dataset[InputFragment], confidence: Double,
          minHitGroups: Int, detail: Boolean): Dataset[ClassifiedRead] = {
        val session = reads.sparkSession
        import session.implicits._
        reads.mapPartitions { it =>
          val resolver = new graft.taxa.LcaResolver(tax.value)
          val tbl = bc.value
          it.flatMap { f =>
            val hits = fragHits(f, tbl)
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
          val resolver = new graft.taxa.LcaResolver(tax.value)
          val tbl = bc.value
          it.flatMap { f =>
            val hits = fragHits(f, tbl)
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

  /** (title, taxon) projection of [[classify]], kept for report-only callers. */
  def classifyReport(spans: Dataset[WideOrdinalSpan], records: DataFrame,
      confidence: Double = 0.0, minHitGroups: Int = 2): DataFrame =
    classify(spans, records, confidence, minHitGroups)
      .select(col("title"), col("taxon"))

  /** Per-taxon read counts -> Kraken-style report (shared kernel). */
  def report(classified: Dataset[ClassifiedRead]): KrakenReport =
    ClassifyKernel.report(classified, bcTax)

  // ---------------- persistence (bucketed parquet) ----------------

  /** Bucketed persistence on the two-long key (same scheme as the narrow
    * index: bucketBy + DDL reload keeps the classify join one-sided). */
  def writeRecords(records: DataFrame, path: String, buckets: Int): Unit = {
    val spark = records.sparkSession
    val table = MinimizerIndex.tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    records.write
      .bucketBy(buckets, "id1", "id2")
      .sortBy("id1", "id2")
      .option("path", path)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table)
    IndexParams.write(spark, IndexParams(k = k, m = m, spaces = spaces,
      buckets = buckets,
      demoted = if (demoted.isEmpty) None else Some(demoted)), path)
  }

  def loadRecords(spark: SparkSession, path: String, buckets: Int): DataFrame = {
    val table = MinimizerIndex.tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (id1 BIGINT, id2 BIGINT, taxon INT)
         |USING PARQUET
         |CLUSTERED BY (id1, id2) SORTED BY (id1, id2) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    spark.table(table)
  }
}
