package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.sources.Sequences
import graft.taxa.Taxonomy

/** End-to-end classification-accuracy head-to-head against the REFERENCE
  * ENGINE'S OWN MEASURED OUTPUT on its shipped test data.
  *
  * The golden numbers below were produced by running the reference engine
  * itself in this sandbox (compiled from /root/reference sources via
  * tools/refbaseline/run_baseline.sh — see BASELINE.md "Measured
  * head-to-head") on exactly the inputs this spec rebuilds:
  *
  *   library  = SRR094926_10k.fasta (9,845 cow-rumen reads, labels
  *              alternating 455631/526997 in file order)
  *              + Akashinriki_10k.fasta chr1H -> 9606
  *   reads    = ERR599052_10k.fastq (10,000 Tara-ocean reads)
  *   params   = k=35, m=31, spaces=7 (the reference build command's own
  *              defaults), confidence 0, minHitGroups 2
  *
  * Reference output (kreport + per-read kraken lines, sample=all):
  *   index records:     348,619
  *   output rows:       9,992 (the 8 reads shorter than k produce no row)
  *   unclassified:      9,988
  *   classified:        ERR599052.3    -> 455631
  *                      ERR599052.7563 -> 9606
  *                      ERR599052.8389 -> 455631
  *                      ERR599052.8892 -> 455631
  *
  * Matching ALL of these pins graft to the reference bit-for-bit on real
  * published sequencing data: same minimizer set (record count), same
  * per-read decisions, same short-read semantics.
  */
class ReferenceHeadToHeadGoldenSpec extends AnyFunSuite
    with SparkSessionTestWrapper {

  private val dir = "/root/reference/testData"

  test("graft reproduces the reference engine's measured classification " +
    "on its shipped data (k=35, m=31, s=7)") {
    import spark.implicits._
    val ss = spark

    // Taxonomy = the reference's hardcoded tiny test taxonomy (its test
    // sources' TestData.taxonomy): two strains + one species under root.
    val tax = Taxonomy.fromTuples(Seq(
      (455631, 1, "strain", "Clostridioides difficile QCD-66c26"),
      (526997, 1, "strain", "Bacillus mycoides DSM 2048"),
      (9606, 1, "species", "Homo sapiens")))
    val bcTax = ss.sparkContext.broadcast(tax)

    // Labels assigned in FILE order (the same deterministic rule the
    // head-to-head harness uses): SRR reads alternate the two strains,
    // barley chr1H is 9606. Read locally so ordering is unambiguous.
    def headers(path: String): Seq[String] = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().filter(_.startsWith(">"))
        .map(_.drop(1).takeWhile(_ != ' ')).toVector
      finally src.close()
    }
    val srrLabels = headers(s"$dir/SRR094926_10k.fasta").zipWithIndex.map {
      case (h, i) => (h, if (i % 2 == 0) 455631 else 526997)
    }
    val labels = (srrLabels :+ ("chr1H" -> 9606)).toMap

    val lib = (Sequences.fasta(ss, s"$dir/SRR094926_10k.fasta") union
        Sequences.fasta(ss, s"$dir/Akashinriki_10k.fasta"))
      .map(f => (labels(f.header), f.nucleotides))
      .repartition(8)

    val index = new MinimizerIndex(
      IndexParams(k = 35, m = 31, spaces = 7, buckets = 8), bcTax)
    val records = index.makeRecords(lib).persist()
    try {
      // same minimizer-LCA set as the reference's measured build
      assert(records.count() === 348619L)

      val reads = Sequences.fastq(ss, s"$dir/ERR599052_10k.fastq")
      val out = index.classify(index.spans(reads), records,
          confidence = 0.0, minHitGroups = 2)
        .collect()
      assert(out.length === 9992)
      assert(out.count(!_.classified) === 9988)
      val classified = out.filter(_.classified)
        .map(c => c.title -> c.taxon).sorted.toSeq
      assert(classified === Seq(
        "ERR599052.3" -> 455631,
        "ERR599052.7563" -> 9606,
        "ERR599052.8389" -> 455631,
        "ERR599052.8892" -> 455631))
    } finally { records.unpersist(); bcTax.destroy() }
  }

  /** Paired-end classification pinned to the reference engine's measured
    * output: mate pairs derived from the shipped reads (R1 = first half,
    * R2 = second half, /1 and /2 title suffixes — both engines strip the
    * suffix and join mates by header, then classify R1 + mate border + R2
    * as ONE record).
    *
    * Reference measured (tools/refbaseline PAIRED=1 at rep_factor 1):
    * 10,000 pairs, exactly TWO classified — ERR599052.8389 and
    * ERR599052.8892, both to 455631 (halving drops the other two
    * single-end positives below the hit threshold). */
  test("graft reproduces the reference engine's measured paired-end " +
    "classification on derived mate pairs") {
    import spark.implicits._
    val ss = spark

    val tax = Taxonomy.fromTuples(Seq(
      (455631, 1, "strain", "Clostridioides difficile QCD-66c26"),
      (526997, 1, "strain", "Bacillus mycoides DSM 2048"),
      (9606, 1, "species", "Homo sapiens")))
    val bcTax = ss.sparkContext.broadcast(tax)

    def headers(path: String): Seq[String] = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().filter(_.startsWith(">"))
        .map(_.drop(1).takeWhile(_ != ' ')).toVector
      finally src.close()
    }
    val srrLabels = headers(s"$dir/SRR094926_10k.fasta").zipWithIndex.map {
      case (h, i) => (h, if (i % 2 == 0) 455631 else 526997)
    }
    val labels = (srrLabels :+ ("chr1H" -> 9606)).toMap
    val lib = (Sequences.fasta(ss, s"$dir/SRR094926_10k.fasta") union
        Sequences.fasta(ss, s"$dir/Akashinriki_10k.fasta"))
      .map(f => (labels(f.header), f.nucleotides))
      .repartition(8)

    val index = new MinimizerIndex(
      IndexParams(k = 35, m = 31, spaces = 7, buckets = 8), bcTax)
    val records = index.makeRecords(lib).persist()
    try {
      val singles = Sequences.fastq(ss, s"$dir/ERR599052_10k.fastq")
      val r1 = singles.map { f =>
        f.copy(header = f.header + "/1",
          nucleotides = f.nucleotides.substring(0, f.nucleotides.length / 2))
      }
      val r2 = singles.map { f =>
        f.copy(header = f.header + "/2",
          nucleotides = f.nucleotides.substring(f.nucleotides.length / 2))
      }
      val out = index.classify(index.spans(Sequences.paired(r1, r2)),
          records, confidence = 0.0, minHitGroups = 2)
        .collect()
      assert(out.length === 10000)
      val classified = out.filter(_.classified)
        .map(c => c.title -> c.taxon).sorted.toSeq
      assert(classified === Seq(
        "ERR599052.8389" -> 455631,
        "ERR599052.8892" -> 455631))
    } finally { records.unpersist(); bcTax.destroy() }
  }

  /** Two-step dynamic classification pinned to the reference engine's
    * measured classify2 output on the same shipped data under a
    * HIERARCHICAL taxonomy (strains under species under a genus — the
    * flat test taxonomy has no species ancestor for the strains, which
    * would make species-rank selection degenerate).
    *
    * Reference measured (tools/refbaseline run, tier t3 at rep_factor 1,
    * criterion ClassifiedReadCount(2, 0.0), rank species, c=0.0,
    * minHitGroups=2): detected set = {455631} ("produced 1 taxa at rank
    * Species, expanded with descendants to 1"); 9,992 output rows; the
    * THREE cdiff reads stay classified and the human read ERR599052.7563
    * — classified by the static pass — is DROPPED because its species
    * clade has only 1 first-pass read (< 2). */
  test("graft reproduces the reference engine's measured classify2 " +
    "(dynamic two-step) output, including the dropped under-threshold taxon") {
    import spark.implicits._
    val ss = spark

    val tax = Taxonomy.fromTuples(Seq(
      (100, 1, "genus", "genus one"),
      (200, 100, "species", "Clostridioides difficile"),
      (300, 100, "species", "Bacillus mycoides"),
      (455631, 200, "strain", "Clostridioides difficile QCD-66c26"),
      (526997, 300, "strain", "Bacillus mycoides DSM 2048"),
      (9606, 1, "species", "Homo sapiens")))
    val bcTax = ss.sparkContext.broadcast(tax)

    def headers(path: String): Seq[String] = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().filter(_.startsWith(">"))
        .map(_.drop(1).takeWhile(_ != ' ')).toVector
      finally src.close()
    }
    val srrLabels = headers(s"$dir/SRR094926_10k.fasta").zipWithIndex.map {
      case (h, i) => (h, if (i % 2 == 0) 455631 else 526997)
    }
    val labels = (srrLabels :+ ("chr1H" -> 9606)).toMap

    val lib = (Sequences.fasta(ss, s"$dir/SRR094926_10k.fasta") union
        Sequences.fasta(ss, s"$dir/Akashinriki_10k.fasta"))
      .map(f => (labels(f.header), f.nucleotides))
      .repartition(8)

    val index = new MinimizerIndex(
      IndexParams(k = 35, m = 31, spaces = 7, buckets = 8), bcTax)
    val dyn = new DynamicClassifier(index, bcTax)
    val staticRecords = index.makeRecords(lib).persist()
    try {
      val reads = Sequences.fastq(ss, s"$dir/ERR599052_10k.fastq")
      val (classifiedDs, selected, release) = dyn.classify2(
        reads, lib, staticRecords,
        criterion = ClassifiedReads, rank = "species", threshold = 2,
        confidence = 0.0, minHitGroups = 2, initConfidence = Some(0.0))
      val out = classifiedDs.collect()
      release()
      assert(selected == collection.BitSet(455631))
      assert(out.length === 9992)
      val classified = out.filter(_.classified)
        .map(c => c.title -> c.taxon).sorted.toSeq
      assert(classified === Seq(
        "ERR599052.3" -> 455631,
        "ERR599052.8389" -> 455631,
        "ERR599052.8892" -> 455631))
    } finally { staticRecords.unpersist(); bcTax.destroy() }
  }

  /** Per-sample classify2 pinned to the reference engine's measured
    * output. The r16 head-to-head (PERSAMPLE=1, 64 samples) proved the
    * union of serial reference classify2 runs — one per sample's reads —
    * equals graft's one-pass classify2MultiSample exactly (639,488 reads,
    * 192 classified). Here each sample carries the SAME shipped reads
    * (suffixed _rN), so the reference-measured expectation per sample is
    * the classify2 golden above: {455631} selected, the three cdiff reads
    * classified, the under-threshold human read dropped. Two identical
    * samples also exercise the shared-selection-group sub-index path. */
  test("graft reproduces the reference engine's measured per-sample " +
    "classify2 output (one-pass multi-sample vs serial reference runs)") {
    import spark.implicits._
    val ss = spark

    val tax = Taxonomy.fromTuples(Seq(
      (100, 1, "genus", "genus one"),
      (200, 100, "species", "Clostridioides difficile"),
      (300, 100, "species", "Bacillus mycoides"),
      (455631, 200, "strain", "Clostridioides difficile QCD-66c26"),
      (526997, 300, "strain", "Bacillus mycoides DSM 2048"),
      (9606, 1, "species", "Homo sapiens")))
    val bcTax = ss.sparkContext.broadcast(tax)

    def headers(path: String): Seq[String] = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().filter(_.startsWith(">"))
        .map(_.drop(1).takeWhile(_ != ' ')).toVector
      finally src.close()
    }
    val srrLabels = headers(s"$dir/SRR094926_10k.fasta").zipWithIndex.map {
      case (h, i) => (h, if (i % 2 == 0) 455631 else 526997)
    }
    val labels = (srrLabels :+ ("chr1H" -> 9606)).toMap

    val lib = (Sequences.fasta(ss, s"$dir/SRR094926_10k.fasta") union
        Sequences.fasta(ss, s"$dir/Akashinriki_10k.fasta"))
      .map(f => (labels(f.header), f.nucleotides))
      .repartition(8)

    val index = new MinimizerIndex(
      IndexParams(k = 35, m = 31, spaces = 7, buckets = 8), bcTax)
    val dyn = new DynamicClassifier(index, bcTax)
    val staticRecords = index.makeRecords(lib).persist()
    try {
      val singles = Sequences.fastq(ss, s"$dir/ERR599052_10k.fastq")
      val reads = (0 until 2).map(r =>
        singles.map(f => f.copy(header = f.header + s"_r$r")))
        .reduce(_ union _)
      val (classifiedDs, perSample, release) = dyn.classify2MultiSample(
        reads, "_r([0-9]+)$", lib, staticRecords,
        criterion = ClassifiedReads, rank = "species", threshold = 2,
        confidence = 0.0, minHitGroups = 2, initConfidence = Some(0.0))
      val out = classifiedDs.collect()
      release()
      // each sample independently selects exactly the cdiff clade
      assert(perSample.keySet == Set("0", "1"))
      for ((s, sel) <- perSample)
        assert(sel == collection.BitSet(455631), s"sample $s")
      assert(out.length === 2 * 9992)
      val classified = out.filter(_.classified)
        .map(c => c.title -> c.taxon).sorted.toSeq
      assert(classified === Seq(
        "ERR599052.3_r0" -> 455631,
        "ERR599052.3_r1" -> 455631,
        "ERR599052.8389_r0" -> 455631,
        "ERR599052.8389_r1" -> 455631,
        "ERR599052.8892_r0" -> 455631,
        "ERR599052.8892_r1" -> 455631))
    } finally { staticRecords.unpersist(); bcTax.destroy() }
  }
}
