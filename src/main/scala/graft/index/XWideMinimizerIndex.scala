package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kmers.{SupermerScanner, XWidePriority, XWideScanner, XWideSupermer}
import graft.sources.InputFragment
import graft.taxa.{Sentinels, Taxonomy}

/** An extra-wide classification-time span: the ordinal/flag/mate protocol of
  * [[OrdinalSpan]] with the minimizer as four longs (id1 = leading word;
  * id4 = 0 at idLongs = 3 and dropped from the DataFrame schema). */
final case class XWideOrdinalSpan(
    id1: Long, id2: Long, id3: Long, id4: Long, distinct: Boolean, kmers: Int,
    flag: Int, ordinal: Int, title: String, seqLen: Int)

/** Extra-wide minimizer index (m in [65, 128]): records carry
  * `idLongs = ceil(m/32)` key columns (id1..id3 or id1..id4) — the
  * reference's column scheme at widths 3 and 4 (behavioral spec: reference
  * kmers/KmerKeyedIndex.scala:27-55; the arity-matched flatMap emission
  * mirrors reference slacken/Minimizers.scala:44-75, which switches on
  * numIdColumns the same way). Only the key columns differ from
  * [[MinimizerIndex]]/[[WideMinimizerIndex]]: span extraction carries the
  * identical ordinal/flag/mate-border protocol and classification shares
  * [[ClassifyKernel]], so per-read output, paired-end reads and confidence
  * thresholds work unchanged. Joins/groupBys run on primitive long columns
  * so Tungsten hashing stays allocation-free.
  */
final class XWideMinimizerIndex(k: Int, m: Int, bcTax: Broadcast[Taxonomy],
    spaces: Int = 0, demoted: Array[Long] = Array.emptyLongArray)
    extends KeyedIndex {

  import Sentinels._

  val scanner = new XWideScanner(k,
    new XWidePriority(m, spaces = spaces, demoted = demoted))

  /** 3 for m in [65, 96], 4 for [97, 128]. */
  val idLongs: Int = scanner.words

  // ---------------- KeyedIndex (width-independent face) ----------------

  override def keyCols: Seq[String] = (1 to idLongs).map(i => s"id$i")

  override def kOf: Int = k

  override def scanKeyed(segment: CharSequence): Iterator[KeyedSupermer] =
    scanner.scan(segment).map { sm =>
      KeyedSupermer(sm.ids(0), sm.ids(1), sm.start, sm.kmers,
        k3 = sm.ids(2), k4 = if (idLongs == 4) sm.ids(3) else 0L)
    }

  override def taxonomyOf: Broadcast[Taxonomy] = bcTax

  override def spansDF(reads: Dataset[InputFragment]): DataFrame =
    dropUnused(spans(reads).toDF())

  /** DataFrames carry exactly idLongs key columns (the reference schema);
    * the 4-field span/record case classes pad id4 with 0 at idLongs = 3. */
  private def dropUnused(df: DataFrame): DataFrame =
    if (idLongs == 4) df else df.drop("id4")

  override def buildRecords(library: Dataset[(Int, String)]): DataFrame =
    makeRecords(library)

  /** Arity-matched (key..., taxon) emission — one tuple shape per idLongs,
    * so the DataFrame schema is exactly the reference's id1..idN columns. */
  private def leafPairs(library: Dataset[(Int, String)]): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val sc = scanner
    val kk = k
    val tax = bcTax
    def supermers(taxon: Int, seq: String): Iterator[XWideSupermer] =
      if (!tax.value.isDefined(taxon)) Iterator.empty
      else SupermerScanner.splitByAmbiguity(seq).iterator.flatMap { run =>
        if (!run.valid || run.seq.length < kk) Iterator.empty
        else sc.scan(run.seq)
      }
    idLongs match {
      case 3 => library.flatMap { case (taxon, seq) =>
        supermers(taxon, seq).map(sm =>
          (sm.ids(0), sm.ids(1), sm.ids(2), taxon))
      }.toDF("id1", "id2", "id3", "taxon")
      case 4 => library.flatMap { case (taxon, seq) =>
        supermers(taxon, seq).map(sm =>
          (sm.ids(0), sm.ids(1), sm.ids(2), sm.ids(3), taxon))
      }.toDF("id1", "id2", "id3", "id4", "taxon")
    }
  }

  override def buildLeafPairs(library: Dataset[(Int, String)]): DataFrame =
    leafPairs(library).distinct()

  override def foldLeafPairs(pairs: DataFrame, extraCols: Seq[String] = Nil)
      : DataFrame = {
    val spark = pairs.sparkSession
    val lcaName = graft.taxa.LcaAggregate.register(spark, bcTax)
    pairs.groupBy((extraCols ++ keyCols).map(col): _*)
      .agg(graft.taxa.LcaAggregate.lcaAgg(lcaName, col("taxon")).as("taxon"))
  }

  def makeRecords(library: Dataset[(Int, String)], saltBuckets: Int = 0)
      : DataFrame =
    foldRecords(leafPairs(library), saltBuckets)

  /** The n-long LCA fold, optionally two-stage salted (legal: LCA is
    * associative + commutative), shared by the string and packed builds. */
  private def foldRecords(pairs: DataFrame, saltBuckets: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val lcaName = graft.taxa.LcaAggregate.register(spark, bcTax)
    val lcaAgg = (c: org.apache.spark.sql.Column) =>
      graft.taxa.LcaAggregate.lcaAgg(lcaName, c)
    if (saltBuckets <= 0)
      pairs.groupBy(keyCols.map(col): _*).agg(lcaAgg($"taxon").as("taxon"))
    else
      pairs
        .withColumn("salt", pmod(hash($"taxon"), lit(saltBuckets)))
        .groupBy((keyCols :+ "salt").map(col): _*)
        .agg(lcaAgg($"taxon").as("taxon"))
        .groupBy(keyCols.map(col): _*).agg(lcaAgg($"taxon").as("taxon"))
  }

  /** [[makeRecords]] over a 2-bit packed library (see
    * [[MinimizerIndex.packLibrary]]): identical records through a zero-copy
    * packed view, arity-matched like [[leafPairs]]. */
  def makeRecordsPacked(library: Dataset[(Int, Array[Byte], Int)],
      saltBuckets: Int = 0): DataFrame = {
    val spark = library.sparkSession
    import spark.implicits._
    val sc = scanner
    val tax = bcTax
    def supermers(taxon: Int, packed: Array[Byte], len: Int) =
      if (!tax.value.isDefined(taxon)) Iterator.empty
      else sc.scan(new graft.kmers.Dna.Packed(packed, len))
    val pairs = idLongs match {
      case 3 => library.flatMap { case (taxon, packed, len) =>
        supermers(taxon, packed, len).map(sm =>
          (sm.ids(0), sm.ids(1), sm.ids(2), taxon))
      }.toDF("id1", "id2", "id3", "taxon")
      case 4 => library.flatMap { case (taxon, packed, len) =>
        supermers(taxon, packed, len).map(sm =>
          (sm.ids(0), sm.ids(1), sm.ids(2), sm.ids(3), taxon))
      }.toDF("id1", "id2", "id3", "id4", "taxon")
    }
    foldRecords(pairs, saltBuckets)
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
    dropUnused(reads.mapPartitions { it =>
      it.flatMap { case (ts, f) =>
        fragmentSpans(f, sc).map(s => (ts, s.id1, s.id2, s.id3, s.id4, s.kmers))
      }
    }.toDF("ts", "id1", "id2", "id3", "id4", "kmers"))
  }

  // ---------------- span extraction (executor-local kernel) ----------------

  /** Split one fragment into extra-wide ordinal spans — the
    * [[MinimizerIndex.fragmentSpans]] protocol with n-word keys. */
  def fragmentSpans(f: InputFragment, sc: XWideScanner)
      : Iterator[XWideOrdinalSpan] = {
    val kk = k
    val n = idLongs
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val totalLen = f.nucleotides.length + f.nucleotides2.map(_.length).getOrElse(0)

    def randomKey(): Array[Long] = Array.fill(n)(rnd.nextLong())

    def segSpans(seq: String): Iterator[(Array[Long], Int, Int)] =
      SupermerScanner.splitByAmbiguity(seq).iterator.flatMap { run =>
        if (run.seq.length < kk) Iterator.empty
        else if (run.valid)
          sc.scan(run.seq).map(sm => (sm.ids, sm.kmers, SEQUENCE_FLAG))
        else
          Iterator((randomKey(), run.seq.length - (kk - 1), AMBIGUOUS_FLAG))
      }

    val all: Iterator[(Array[Long], Int, Int)] = f.nucleotides2 match {
      case Some(nt2) =>
        segSpans(f.nucleotides) ++
          Iterator((randomKey(), 0, MATE_PAIR_BORDER_FLAG)) ++
          segSpans(nt2)
      case None => segSpans(f.nucleotides)
    }

    val last = new Array[Long](n)
    var first = true
    all.zipWithIndex.map { case ((ids, kmers, flag), ordinal) =>
      val isSeq = flag == SEQUENCE_FLAG
      val changed = {
        var w = 0; var diff = false
        while (w < n && !diff) { diff = ids(w) != last(w); w += 1 }
        diff
      }
      val distinct = isSeq && (first || changed)
      if (isSeq) { System.arraycopy(ids, 0, last, 0, n); first = false }
      XWideOrdinalSpan(ids(0), ids(1), ids(2), if (n == 4) ids(3) else 0L,
        distinct, kmers, flag, ordinal, f.header, totalLen)
    }
  }

  def spans(reads: Dataset[InputFragment]): Dataset[XWideOrdinalSpan] = {
    val spark = reads.sparkSession
    import spark.implicits._
    val sc = scanner
    reads.mapPartitions(it => it.flatMap(f => fragmentSpans(f, sc)))
  }

  // ---------------- classification ----------------

  /** Per-read classification: left join on the idLongs-column key (the
    * bucketed record side does not shuffle), then the shared kernel. */
  def classify(spans: Dataset[XWideOrdinalSpan], records: DataFrame,
      confidence: Double = 0.0, minHitGroups: Int = 2): Dataset[ClassifiedRead] =
    classifyDF(dropUnused(spans.toDF()), records, confidence, minHitGroups)

  /** Zero-shuffle classifier with a broadcast n-long-key table — see
    * [[MinimizerIndex.inMemoryClassifier]]; identical design at this
    * width. */
  override def inMemoryClassifier(records: DataFrame): InMemoryClassifier = {
    val spark = records.sparkSession
    val n = idLongs
    val rows = records
      .select((keyCols.map(col) :+ col("taxon")): _*)
      .collect()
    val flat = new Array[Long](rows.length * n)
    val taxa = new Array[Int](rows.length)
    var r = 0
    while (r < rows.length) {
      var w = 0
      while (w < n) { flat(r * n + w) = rows(r).getLong(w); w += 1 }
      taxa(r) = rows(r).getInt(n)
      r += 1
    }
    val table = XWideTaxonMap(flat, taxa, n)
    val bc = spark.sparkContext.broadcast(table)
    val sc = scanner
    val tax = bcTax
    val outer = this
    new InMemoryClassifier {
      override def tableBytes: Long = table.byteSize
      override def close(): Unit = bc.destroy()

      private def fragHits(f: InputFragment, tbl: XWideTaxonMap): Vector[TaxonHit] =
        outer.fragmentSpans(f, sc).map { s =>
          val t = s.flag match {
            case AMBIGUOUS_FLAG => AMBIGUOUS_SPAN
            case MATE_PAIR_BORDER_FLAG => MATE_PAIR_BORDER
            case _ => tbl.get(s.id1, s.id2, s.id3, s.id4)
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

  /** Per-taxon read counts -> Kraken-style report (shared kernel). */
  def report(classified: Dataset[ClassifiedRead]): KrakenReport =
    ClassifyKernel.report(classified, bcTax)

  // ---------------- persistence (bucketed parquet) ----------------

  /** Bucketed persistence on the idLongs-column key (bucketBy + DDL reload
    * keeps the classify join one-sided, as at every other width). */
  def writeRecords(records: DataFrame, path: String, buckets: Int): Unit = {
    val spark = records.sparkSession
    val table = MinimizerIndex.tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    records.write
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .option("path", path)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table)
    IndexParams.write(spark, IndexParams(k = k, m = m, spaces = spaces,
      buckets = buckets,
      demoted = if (demoted.isEmpty) None else Some(demoted)), path)
  }

  def loadRecords(spark: SparkSession, path: String, buckets: Int): DataFrame = {
    val table = MinimizerIndex.tableName(path)
    val keySchema = keyCols.map(c => s"$c BIGINT").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($keySchema, taxon INT)
         |USING PARQUET
         |CLUSTERED BY (${keyCols.mkString(", ")})
         |SORTED BY (${keyCols.mkString(", ")}) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    spark.table(table)
  }
}

/** Open-addressing n-long-key -> taxon table for the extra-wide in-memory
  * path: flattened key words (keys(i*n .. i*n+n-1)), explicit used[] — the
  * [[WideTaxonMap]] design at idLongs 3 and 4. Lookups take the four
  * normalized words (id4 = 0 at n = 3, which round-trips because build
  * stores the same padding). */
final class XWideTaxonMap private (used: Array[Boolean], keys: Array[Long],
    vals: Array[Int], n: Int) extends Serializable {

  @inline def get(a: Long, b: Long, c: Long, d: Long): Int = {
    val cap = used.length
    var i = XWideTaxonMap.hash4(a, b, c, d, n) & (cap - 1)
    while (true) {
      if (!used(i)) return Taxonomy.NONE
      if (XWideTaxonMap.same(keys, i * n, a, b, c, d, n)) return vals(i)
      i = (i + 1) & (cap - 1)
    }
    Taxonomy.NONE
  }

  /** Measured footprint: used + n key words + taxon per slot, plus
    * headers. */
  def byteSize: Long = (1L + 8L * n + 4L) * used.length + (n + 2) * 16L
}

object XWideTaxonMap {
  /** ONE hash and ONE key-equality definition shared by build and probe —
    * a divergence between the two would make every lookup miss. */
  @inline private def hash4(a: Long, b: Long, c: Long, d: Long, n: Int): Int = {
    var h = (a * 0x9e3779b97f4a7c15L) ^ (b * 0xbf58476d1ce4e5b9L)
    h = (h * 0x9e3779b97f4a7c15L) ^ (c * 0xbf58476d1ce4e5b9L)
    if (n == 4) h = (h * 0x9e3779b97f4a7c15L) ^ (d * 0xbf58476d1ce4e5b9L)
    java.lang.Long.hashCode(h)
  }

  @inline private def same(keys: Array[Long], o: Int, a: Long, b: Long,
      c: Long, d: Long, n: Int): Boolean =
    keys(o) == a && keys(o + 1) == b && keys(o + 2) == c &&
      (n == 3 || keys(o + 3) == d)

  /** Build from flattened keys (rows*n words) and per-row taxa. */
  def apply(flat: Array[Long], taxa: Array[Int], n: Int): XWideTaxonMap = {
    require(n == 3 || n == 4, s"idLongs must be 3 or 4, got $n")
    val rows = taxa.length
    val cap = LongTaxonMap.capacityFor(rows)
    val used = new Array[Boolean](cap)
    val keys = new Array[Long](cap * n)
    val vals = new Array[Int](cap)
    var r = 0
    while (r < rows) {
      val a = flat(r * n); val b = flat(r * n + 1); val c = flat(r * n + 2)
      val d = if (n == 4) flat(r * n + 3) else 0L
      var i = hash4(a, b, c, d, n) & (cap - 1)
      while (used(i) && !same(keys, i * n, a, b, c, d, n))
        i = (i + 1) & (cap - 1)
      used(i) = true
      System.arraycopy(flat, r * n, keys, i * n, n)
      vals(i) = taxa(r)
      r += 1
    }
    new XWideTaxonMap(used, keys, vals, n)
  }
}
