package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.index.{IndexParams, MinimizerIndex}
import graft.taxa.Taxonomy

/** The pipeline on REAL published sequencing data the reference ships for
  * its own unit tests (testData/README.txt: cow-rumen metagenome SRR094926,
  * barley chr1H excerpt Akashinriki, Tara-ocean reads ERR599052) — data we
  * did not synthesize, carrying the edge shapes synthetic inputs miss:
  * 3,376 of the 10,000 FASTQ quality lines start with '@' (the classic
  * split-sync hazard), read lengths vary 30..101 bp, and the barley
  * sequence is 18.8% N (real masked regions driving ambiguity
  * segmentation). The session's 64 KiB maxPartitionBytes splits the 3 MiB
  * FASTQ into ~48 tasks, so record sync at split borders is exercised for
  * real, not simulated.
  */
class RealSequencingDataSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/reference/testData"

  test("split-parallel FASTQ parse of real ERR599052 reads (quality lines starting with '@')") {
    val frags = Sequences.fastq(spark, s"$dir/ERR599052_10k.fastq").collect()
    assert(frags.length === 10000)
    // no record lost or duplicated across the ~48 split borders
    assert(frags.map(_.header).distinct.length === 10000)
    assert(frags.forall(_.nucleotides.matches("[ACGTN]+")))
    assert(frags.map(_.nucleotides.length).min === 30)
    assert(frags.map(_.nucleotides.length).max === 101)
    // byte locations are genuine offsets: unique and within the file
    assert(frags.map(_.location).distinct.length === 10000)
    assert(frags.forall(f => f.location >= 0 && f.location < 3150622L))
  }

  test("multi-line FASTA parse of real SRR094926 reads") {
    val frags = Sequences.fasta(spark, s"$dir/SRR094926_10k.fasta").collect()
    assert(frags.length === 9845)
    assert(frags.map(_.header).distinct.length === 9845)
    // every read is 101 bp in this excerpt; headers keep the accession only
    // (the " HWI-ST122:..." tail after the first space is dropped)
    assert(frags.forall(_.nucleotides.length === 101))
    assert(frags.map(_.nucleotides.map(_.toLong.toInt).length).sum === 994345)
    assert(frags.forall(f => f.header.startsWith("SRR094926.") && !f.header.contains(" ")))
  }

  test("indexed-FASTA byte-seek read of real barley chr1H equals the streaming parse") {
    val k = 35
    val whole = Sequences.fasta(spark, s"$dir/Akashinriki_10k.fasta").collect()
    assert(whole.length === 1 && whole.head.header === "chr1H")
    val seq = whole.head.nucleotides
    assert(seq.length === 599940)

    val frags = IndexedFasta
      .fragments(spark, s"$dir/Akashinriki_10k.fasta", k, maxFragment = 50000)
      .collect().sortBy(_.location)
    // k-1-overlapped fragments reassemble the exact sequence: real 60/61
    // line geometry, seek offsets, newline stripping all on the hook
    val rebuilt = new StringBuilder(frags.head.nucleotides)
    for (f <- frags.tail) {
      assert(f.location === rebuilt.length - (k - 1),
        s"fragment at base ${f.location} does not continue the k-1 overlap")
      rebuilt.append(f.nucleotides.substring(k - 1))
    }
    assert(rebuilt.toString === seq)
  }

  test("classify real ocean reads against a real-genome library: join and in-memory paths row-identical") {
    import spark.implicits._
    val ss = spark
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "barley"), (5, 2, "species", "rumen")))
    val bcTax = ss.sparkContext.broadcast(tax)

    // two real "genomes": barley chr1H (18.8% N -> ambiguity segmentation
    // on real masked regions) and the cow-rumen reads concatenated
    val barley = Sequences.fasta(ss, s"$dir/Akashinriki_10k.fasta")
      .collect().head.nucleotides
    val rumen = Sequences.fasta(ss, s"$dir/SRR094926_10k.fasta")
      .collect().map(_.nucleotides).mkString("N") // N-joined: no chimeric k-mers
    val lib = ss.createDataset(Seq((4, barley), (5, rumen))).repartition(8)

    val index = new MinimizerIndex(
      IndexParams(k = 35, m = 31, spaces = 7, buckets = 8), bcTax)
    val records = index.makeRecords(lib).persist()
    assert(records.count() > 0)

    val reads = Sequences.fastq(ss, s"$dir/ERR599052_10k.fastq")
    val viaJoin = index.classify(index.spans(reads), records, minHitGroups = 1)
      .collect().map(c => c.title -> ((c.classified, c.taxon, c.length, c.hits)))
      .toMap
    val mem = index.inMemoryClassifier(records)
    try {
      val viaMem = mem.classify(reads, confidence = 0.0, minHitGroups = 1)
        .collect().map(c => c.title -> ((c.classified, c.taxon, c.length, c.hits)))
        .toMap
      // 8 of the 10,000 real reads are shorter than k=35 and yield no spans;
      // reference-faithfully they produce NO output row (the reference
      // filters segments < k at Supermers.scala:113-116 and builds
      // classifications by grouping spans per title, Classifier.scala:77-92
      // — a span-less read never reaches the output there either)
      assert(viaJoin.size === 9992)
      val shortReads = reads.collect().filter(_.nucleotides.length < 35)
      assert(shortReads.length === 8)
      assert(shortReads.forall(r => !viaJoin.contains(r.header)))
      assert(viaMem === viaJoin)
      // the real-data sanity line: some ocean reads DO hit the library, the
      // bulk does not (a classifier that flags everything or nothing is
      // broken in a way row-identity cannot see)
      val classified = viaJoin.count(_._2._1)
      assert(classified > 0 && classified < 5000,
        s"implausible classified-read count on unrelated ocean reads: $classified")
    } finally { mem.close(); records.unpersist(); bcTax.destroy() }
  }
}
