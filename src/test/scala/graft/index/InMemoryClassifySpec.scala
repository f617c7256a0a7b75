package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.sources.InputFragment
import graft.taxa.Taxonomy
import scala.util.Random

/** The zero-shuffle in-memory classification path must be ROW-IDENTICAL to
  * the bucketed-join path — same taxa, same hit strings, same lengths —
  * on clean, ambiguous, paired and chimeric reads, at both key widths and
  * under confidence/min-hit-groups gates. */
class InMemoryClassifySpec extends AnyFunSuite with SparkSessionTestWrapper {

  val rng = new Random(83)
  def dna(n: Int): String = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
  lazy val bcTax = spark.sparkContext.broadcast(tax)
  val genomes = Map(4 -> dna(3000), 5 -> dna(3000))

  def reads: Seq[InputFragment] = {
    val clean = (0 until 40).map { i =>
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 150)
      InputFragment(s"c$i|src=$t", 0L, g.substring(s, s + 150), None)
    }
    // ambiguous middles, chimeras, paired-end with RC mates, junk
    val gnarly = (0 until 15).map { i =>
      val g = genomes(4)
      val s = rng.nextInt(g.length - 400)
      i % 3 match {
        case 0 => InputFragment(s"n$i", 0L,
          g.substring(s, s + 60) + "NNNNN" + g.substring(s + 65, s + 150), None)
        case 1 => InputFragment(s"p$i", 0L, g.substring(s, s + 130),
          Some(graft.kmers.Dna.reverseComplement(g.substring(s + 200, s + 330))))
        case _ => InputFragment(s"x$i", 0L, g.substring(s, s + 60) + dna(90), None)
      }
    }
    clean ++ gnarly
  }

  def asMap(rs: Array[ClassifiedRead]): Map[String, (Boolean, Int, Int, String)] =
    rs.map(c => c.title -> ((c.classified, c.taxon, c.length, c.hits))).toMap

  test("narrow in-memory classification is row-identical to the join path") {
    import spark.implicits._
    val index = new MinimizerIndex(IndexParams(k = 35, m = 31, buckets = 4), bcTax)
    val lib = spark.createDataset(genomes.toSeq)
    val records = index.makeRecords(lib).cache()
    val ds = spark.createDataset(reads)
    for ((conf, mhg) <- Seq((0.0, 1), (0.0, 2), (0.35, 1))) {
      val joined = asMap(index.classify(index.spans(ds), records, conf, mhg)
        .collect())
      val inMem = asMap(index.classifyInMemory(ds, records, conf, mhg).collect())
      assert(inMem == joined, s"conf=$conf minHitGroups=$mhg")
    }
    records.unpersist()
  }

  test("wide in-memory classification is row-identical to the join path") {
    import spark.implicits._
    val index = new WideMinimizerIndex(k = 50, m = 40, bcTax)
    val lib = spark.createDataset(genomes.toSeq)
    val records = index.makeRecords(lib).cache()
    val ds = spark.createDataset(reads)
    for ((conf, mhg) <- Seq((0.0, 1), (0.9, 2))) {
      val joined = asMap(index.classify(index.spans(ds), records, conf, mhg)
        .collect())
      val inMem = asMap(index.classifyInMemory(ds, records, conf, mhg).collect())
      assert(inMem == joined, s"conf=$conf minHitGroups=$mhg")
    }
    records.unpersist()
  }

  test("in-memory sweep equals per-threshold classification at both widths") {
    import spark.implicits._
    val confs = Seq(0.0, 0.35, 0.9)
    val narrow = new MinimizerIndex(IndexParams(k = 35, m = 31, buckets = 4), bcTax)
    val wide = new WideMinimizerIndex(k = 50, m = 40, bcTax)
    val lib = spark.createDataset(genomes.toSeq)
    val ds = spark.createDataset(reads)
    for (index <- Seq(narrow: KeyedIndex, wide: KeyedIndex)) {
      val records = index.buildRecords(lib).cache()
      val mem = index.inMemoryClassifier(records)
      val swept = mem.classifySweep(ds, confs).collect()
        .groupBy(_._1).view.mapValues(v => asMap(v.map(_._2))).toMap
      assert(swept.keySet == confs.toSet)
      for (conf <- confs)
        assert(swept(conf) == asMap(mem.classify(ds, conf).collect()),
          s"conf=$conf width=${index.keyCols.size}")
      records.unpersist()
    }
  }

  test("table byte-size accounting tracks the real JVM footprint") {
    import spark.implicits._
    // measured size: within 2x of Spark's SizeEstimator on the live table
    // (the backing arrays dominate; headers and object padding are noise)
    val narrow = LongTaxonMap(Array.tabulate(10000)(i => (i.toLong * 7919, i)))
    val estN = org.apache.spark.util.SizeEstimator.estimate(narrow)
    assert(narrow.byteSize <= 2 * estN && estN <= 2 * narrow.byteSize,
      s"narrow byteSize ${narrow.byteSize} vs SizeEstimator $estN")
    val wide = WideTaxonMap(
      Array.tabulate(10000)(i => (i.toLong * 7919, i.toLong * 104729, i)))
    val estW = org.apache.spark.util.SizeEstimator.estimate(wide)
    assert(wide.byteSize <= 2 * estW && estW <= 2 * wide.byteSize,
      s"wide byteSize ${wide.byteSize} vs SizeEstimator $estW")
    // the pre-collect prediction from a record count matches the real build
    assert(LongTaxonMap.estimatedBytes(10000, wide = false)
      .contains(narrow.byteSize))
    assert(LongTaxonMap.estimatedBytes(10000, wide = true)
      .contains(wide.byteSize))
    // beyond the hard table bound the prediction declines, like the build
    assert(LongTaxonMap.estimatedBytes((1L << 28) + 1, wide = false).isEmpty)
    // and the classifier exposes the measured size for the CLI log line
    val index = new MinimizerIndex(IndexParams(k = 35, m = 31, buckets = 4), bcTax)
    val records = index.makeRecords(spark.createDataset(genomes.toSeq))
    val mem = index.inMemoryClassifier(records)
    val n = records.count()
    assert(LongTaxonMap.estimatedBytes(n, wide = false).contains(mem.tableBytes),
      s"prediction from $n records must equal the measured build")
  }

  test("in-memory classification runs zero shuffles") {
    import spark.implicits._
    val index = new MinimizerIndex(IndexParams(k = 35, m = 31, buckets = 4), bcTax)
    val lib = spark.createDataset(genomes.toSeq)
    // materialize records FIRST so the classification job starts from a
    // driver-local table, then count the shuffles its own job registers
    val records = index.makeRecords(lib).cache()
    records.count()
    val ds = spark.createDataset(reads)
    val out = index.classifyInMemory(ds, records)
    // the classification dataset's physical plan contains no Exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"in-memory classify plan shuffles:\n$plan")
    assert(out.collect().length == reads.length) // every read is >= k bases
    records.unpersist()
  }
}
