package graft.kmers

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropChecks

class WideScannerSpec extends AnyFunSuite with PropChecks {
  import Gens._

  def decode2(hi: Long, lo: Long, m: Int): String =
    (if (m > 32) Dna.decode(hi, m - 32) else "") + Dna.decode(lo, 32)

  /** Brute-force wide minimizer of the k-mer at offset i. */
  def bruteMin(seq: String, i: Int, k: Int, p: WideRandomXorPriority): (Long, Long) = {
    val m = p.width
    val out = new Array[Long](3)
    var best: (Long, Long, Long) = null
    var j = i
    while (j + m <= i + k) {
      val mer = seq.substring(j, j + m)
      val hi = Dna.encode(mer.substring(0, m - 32))
      val lo = Dna.encode(mer.substring(m - 32))
      p.priorityOf(hi, lo, out)
      val cand = (out(0), out(1), out(2))
      if (best == null || WideRandomXorPriority.priLess(
        cand._1, cand._2, cand._3, best._1, best._2, best._3))
        best = cand
      j += 1
    }
    (best._1, best._2)
  }

  val wideCase: Gen[(String, Int, Int)] = for {
    m <- Gen.chooseNum(33, 64)
    k <- Gen.chooseNum(m, m + 30)
    s <- dnaString(k, 2 * k + 40)
  } yield (s, m, k)

  test("two-word rolling rc matches string reverse complement") {
    forAll(Gen.chooseNum(33, 64).flatMap(m => dnaString(m, m))) { s =>
      val m = s.length
      val hi = Dna.encode(s.substring(0, m - 32))
      val lo = Dna.encode(s.substring(m - 32))
      val (rh, rl) = WideRandomXorPriority.rc(hi, lo, m - 32)
      assert(decode2(rh, rl, m) == Dna.reverseComplement(s))
    }
  }

  test("wide per-kmer minimizer matches brute force; counts sum correctly") {
    forAll(wideCase) { case (s, m, k) =>
      val p = new WideRandomXorPriority(m)
      val sc = new WideSupermerScanner(k, p)
      val sms = sc.scan(s).toVector
      assert(sms.map(_.kmers).sum == s.length - k + 1)
      val perKmer = sms.flatMap(sm => Vector.fill(sm.kmers)((sm.minHi, sm.minLo)))
      val expected = (0 to s.length - k).map(i => bruteMin(s, i, k, p))
      assert(perKmer == expected)
      for (w <- sms.sliding(2) if sms.size > 1)
        assert((w(0).minHi, w(0).minLo) != (w(1).minHi, w(1).minLo))
    }
  }

  test("wide canonical minimizer multiset is reverse-complement invariant") {
    forAll(wideCase) { case (s, m, k) =>
      val sc = new WideSupermerScanner(k, new WideRandomXorPriority(m))
      val fwd = sc.scan(s).map(sm => (sm.minHi, sm.minLo)).toVector.sorted
      val rev = sc.scan(Dna.reverseComplement(s))
        .map(sm => (sm.minHi, sm.minLo)).toVector.sorted
      assert(fwd == rev)
    }
  }

  test("wide space masks clear exactly the odd positions, across both words") {
    for (m <- Seq(33, 40, 64); s <- 0 to m / 2) {
      val lo = WideRandomXorPriority.spaceMaskLo(s)
      val hi = WideRandomXorPriority.spaceMaskHi(s) & Dna.merMask(m - 32)
      def kept(pos: Int): Boolean =
        if (pos < 32) ((lo >>> (2 * pos)) & 3L) == 3L
        else ((hi >>> (2 * (pos - 32))) & 3L) == 3L
      for (pos <- 0 until m) {
        val spaced = pos % 2 == 1 && pos < 2 * s
        assert(kept(pos) != spaced, s"m=$m s=$s pos=$pos")
      }
    }
  }

  test("spaced wide priority ignores spaced positions, sees kept ones") {
    val spacedCase = for {
      m <- Gen.chooseNum(33, 64)
      s <- Gen.chooseNum(1, m / 2)
      mer <- dnaString(m, m)
    } yield (m, s, mer)
    forAll(spacedCase) { case (m, s, mer) =>
      // canonical=false isolates the spacing semantics: canonicalization
      // happens before spacing, so a mutation could otherwise flip strands
      val p = new WideRandomXorPriority(m, canonical = false, spaces = s)
      val out = new Array[Long](3)
      def pri(str: String): (Long, Long) = {
        p.priorityOf(Dna.encode(str.substring(0, m - 32)),
          Dna.encode(str.substring(m - 32)), out)
        (out(0), out(1))
      }
      val base = pri(mer)
      def mutate(pos: Int): String = {
        // position counted from the RIGHT end (bit position), not string index
        val i = m - 1 - pos
        val c = "ACGT"((("ACGT".indexOf(mer(i)) + 1) % 4))
        mer.substring(0, i) + c + mer.substring(i + 1)
      }
      val spacedPos = 2 * (s - 1) + 1 // last spaced position
      assert(pri(mutate(spacedPos)) == base, "spaced position must not matter")
      val keptPos = 2 * (s - 1) // even positions are always kept
      assert(pri(mutate(keptPos)) != base, "kept position must matter")
    }
  }

  test("wide scanner with spacing: counts still tile, fewer distinct keys") {
    forAll(wideCase) { case (s, m, k) =>
      val sp = math.min(7, m / 2)
      val spaced = new WideSupermerScanner(k, new WideRandomXorPriority(m, spaces = sp))
      val sms = spaced.scan(s).toVector
      assert(sms.map(_.kmers).sum == s.length - k + 1)
      // spacing only masks priority bits: every key has the spaced bits zero
      val loMask = WideRandomXorPriority.spaceMaskLo(sp)
      val hiMask = WideRandomXorPriority.spaceMaskHi(sp) & Dna.merMask(m - 32)
      for (sm <- sms) {
        assert((sm.minLo & ~loMask) == 0L)
        assert((sm.minHi & ~hiMask) == 0L)
      }
    }
  }
}

class WideIndexSpec extends AnyFunSuite with graft.SparkSessionTestWrapper {
  import graft.index.WideMinimizerIndex
  import graft.sources.InputFragment
  import graft.taxa.Taxonomy
  import scala.util.Random

  val rng = new Random(47)
  def dna(n: Int) = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  test("wide-m end-to-end: build (id1,id2) records and classify reads") {
    import spark.implicits._
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val index = new WideMinimizerIndex(k = 50, m = 40, bcTax)
    val genomes = Map(4 -> dna(3000), 5 -> dna(3000))
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()
    assert(records.columns.toSeq == Seq("id1", "id2", "taxon"))
    assert(records.count() > 0)
    // distinct (hi, lo) pairs computed locally agree
    val local = genomes.values.flatMap(g =>
      index.scanner.scan(g).map(sm => (sm.minHi, sm.minLo))).toSet
    assert(records.count() == local.size)

    val reads = (0 until 100).map { i =>
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 150)
      InputFragment(s"w$i|src=$t", 0L, g.substring(s, s + 150), None)
    }
    val got = index.classifyReport(index.spans(spark.createDataset(reads)), records)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.size == 100)
    var classified = 0
    for ((title, taxon) <- got if taxon != Taxonomy.NONE) {
      classified += 1
      assert(tax.hasAncestor(title.split("src=")(1).toInt, taxon))
    }
    assert(classified > 90)
  }

  test("wide packed build equals the string build (salted too)") {
    import spark.implicits._
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val index = new WideMinimizerIndex(k = 45, m = 36, bcTax)
    val genomes = Map(4 -> dna(2000),
      5 -> (dna(800) + "NNN" + dna(800))) // ambiguity split before packing
    val lib = spark.createDataset(genomes.toSeq)
    val packed = lib.flatMap { case (t, seq) =>
      graft.kmers.SupermerScanner.splitByAmbiguity(seq).collect {
        case run if run.valid && run.seq.length >= 45 =>
          (t, graft.kmers.Dna.pack2bit(run.seq), run.seq.length)
      }
    }
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int)].collect().toSet
    val viaString = toSet(index.makeRecords(lib))
    assert(toSet(index.makeRecordsPacked(packed)) == viaString)
    assert(toSet(index.makeRecordsPacked(packed, saltBuckets = 5)) == viaString)
  }

  test("wide per-read classify carries hit strings, ordinals and confidence") {
    import spark.implicits._
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val index = new WideMinimizerIndex(k = 50, m = 40, bcTax)
    val genomes = Map(4 -> dna(3000), 5 -> dna(3000))
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()

    val reads = (0 until 50).map { i =>
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 150)
      InputFragment(s"p$i|src=$t", 0L, g.substring(s, s + 150), None)
    }
    val out = index.classify(index.spans(spark.createDataset(reads)), records)
      .collect()
    assert(out.length == 50)
    for (c <- out if c.classified) {
      assert(tax.hasAncestor(c.title.split("src=")(1).toInt, c.taxon))
      assert(c.hits.nonEmpty && c.hits.contains(":"))
      assert(c.length == 150)
    }
    assert(out.count(_.classified) > 45)
    // a strict confidence threshold classifies no more reads than a loose one
    val strict = index
      .classify(index.spans(spark.createDataset(reads)), records, confidence = 0.9)
      .collect()
    assert(strict.count(_.classified) <= out.count(_.classified))

    // ambiguous-junk chimera: classified loose, lifted/unclassified strict
    val chimera = (0 until 10).map { i =>
      val g = genomes(4)
      val s = rng.nextInt(g.length - 80)
      InputFragment(s"chi$i", 0L, g.substring(s, s + 80) + dna(120), None)
    }
    val loose = index.classify(index.spans(spark.createDataset(chimera)), records,
      minHitGroups = 1).collect()
    val hard = index.classify(index.spans(spark.createDataset(chimera)), records,
      confidence = 0.9, minHitGroups = 1).collect()
    assert(hard.count(_.classified) < loose.count(_.classified))
  }

  test("wide multi-threshold sweep equals per-threshold classification") {
    import spark.implicits._
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val index = new WideMinimizerIndex(k = 45, m = 33, bcTax)
    val genomes = Map(4 -> dna(2500), 5 -> dna(2500))
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()
    val reads = (0 until 40).map { i =>
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 140)
      InputFragment(s"mt$i|src=$t", 0L, g.substring(s, s + 140), None)
    }
    val spans = index.spans(spark.createDataset(reads)).cache()
    index.classifyMultiThresholdDF(spans.toDF(), records,
        Seq(0.0, 0.9), minHitGroups = 1) { results =>
      assert(results.map(_._1) == Seq(0.0, 0.9))
      for ((conf, swept) <- results) {
        val single = index.classify(spans, records, conf, minHitGroups = 1)
          .collect().map(c => c.title -> c.taxon).toMap
        assert(swept.collect().map(c => c.title -> c.taxon).toMap == single,
          s"conf $conf")
      }
    }
  }

  test("wide paired-end reads use the mate-pair border protocol") {
    import spark.implicits._
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val index = new WideMinimizerIndex(k = 50, m = 40, bcTax)
    val genomes = Map(4 -> dna(3000), 5 -> dna(3000))
    val records = index.makeRecords(spark.createDataset(genomes.toSeq)).cache()

    val g = genomes(5)
    val reads = (0 until 30).map { i =>
      val s1 = rng.nextInt(g.length - 400)
      InputFragment(s"pair$i", 0L, g.substring(s1, s1 + 130),
        Some(Dna.reverseComplement(g.substring(s1 + 200, s1 + 330))))
    }
    val out = index.classify(index.spans(spark.createDataset(reads)), records)
      .collect()
    for (c <- out if c.classified) assert(tax.hasAncestor(5, c.taxon))
    assert(out.count(_.classified) > 25)
    // both mates contribute: the span count exceeds what either mate alone
    // yields, and the hit string shows the border sentinel
    assert(out.exists(_.hits.contains("|:|")))
    // total length covers both mates
    assert(out.forall(_.length == 260))
  }

  test("m=31 (narrow) and m=33 (wide) classifications agree on clean reads") {
    import spark.implicits._
    import graft.index.{IndexParams, MinimizerIndex}
    val tax = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"), (4, 2, "species", "s4"), (5, 2, "species", "s5")))
    val bcTax = spark.sparkContext.broadcast(tax)
    val genomes = Map(4 -> dna(3000), 5 -> dna(3000))
    val lib = spark.createDataset(genomes.toSeq)

    val narrow = new MinimizerIndex(
      IndexParams(k = 45, m = 31, spaces = 0, buckets = 4), bcTax)
    val wide = new WideMinimizerIndex(k = 45, m = 33, bcTax)
    val nRec = narrow.makeRecords(lib).cache()
    val wRec = wide.makeRecords(lib).cache()

    val reads = (0 until 80).map { i =>
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 150)
      InputFragment(s"a$i|src=$t", 0L, g.substring(s, s + 150), None)
    }
    val ds = spark.createDataset(reads)
    val nGot = narrow.classify(narrow.spans(ds), nRec, minHitGroups = 1)
      .collect().map(c => c.title -> c.taxon).toMap
    val wGot = wide.classify(wide.spans(ds), wRec, minHitGroups = 1)
      .collect().map(c => c.title -> c.taxon).toMap
    assert(nGot.keySet == wGot.keySet)
    // different m => different minimizer sets, but on clean single-source
    // reads both protocols must land on the source taxon almost always
    val agree = nGot.count { case (t, tx) => wGot(t) == tx }
    assert(agree >= 72, s"only $agree/80 reads agree between m=31 and m=33")
    for ((title, tx) <- nGot if tx != Taxonomy.NONE)
      assert(tax.hasAncestor(title.split("src=")(1).toInt, tx))
    for ((title, tx) <- wGot if tx != Taxonomy.NONE)
      assert(tax.hasAncestor(title.split("src=")(1).toInt, tx))
  }
}
