package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.kmers._
import graft.sources.InputFragment
import graft.taxa.Taxonomy
import scala.util.Random

/** End-to-end: random taxonomy + random genomes on leaves, build index,
  * simulate reads, classify — every classified read must map to its source
  * taxon or an ancestor (the reference's own acceptance criterion,
  * ClassifierTest.scala:75-130). */
class MinimizerIndexSpec extends AnyFunSuite with SparkSessionTestWrapper {

  // deterministic fixture
  val rng = new Random(42)
  def randomDna(n: Int): String =
    Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  // taxonomy: root(1) <- 2,3 (genus); 2 <- 4,5 ; 3 <- 6 (species)
  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g1"), (3, 1, "genus", "g2"),
    (4, 2, "species", "s4"), (5, 2, "species", "s5"),
    (6, 3, "species", "s6")))

  val genomes: Map[Int, String] =
    Map(4 -> randomDna(4000), 5 -> randomDna(4000), 6 -> randomDna(4000))

  val params = IndexParams(k = 35, m = 31, spaces = 7, buckets = 4)

  lazy val bcTax = spark.sparkContext.broadcast(tax)
  lazy val index = new MinimizerIndex(params, bcTax)

  lazy val records: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val lib = spark.createDataset(genomes.toSeq.map { case (t, g) => (t, g) })
    index.makeRecords(lib).cache()
  }

  test("index record count equals distinct minimizer count (computed locally)") {
    val scanner = params.scanner
    val local = genomes.values
      .flatMap(g => scanner.scan(g).map(_.minimizer)).toSet
    assert(records.count() == local.size)
  }

  test("single-genome minimizers map to that genome's taxon") {
    import spark.implicits._
    // minimizers present in only genome 4 must have taxon 4 (no LCA lifting)
    val scanner = params.scanner
    val only4 = scanner.scan(genomes(4)).map(_.minimizer).toSet --
      scanner.scan(genomes(5)).map(_.minimizer).toSet --
      scanner.scan(genomes(6)).map(_.minimizer).toSet
    val got = records.as[(Long, Int)].collect().toMap
    for (m <- only4.take(50)) assert(got(m) == 4)
  }

  test("native TypedImperativeAggregate LCA equals the Aggregator UDAF") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val lib = spark.createDataset(genomes.toSeq ++ Seq((5, genomes(4))))
    val native = index.makeRecords(lib).as[(Long, Int)].collect().toMap
    // rebuild the same records through the Aggregator-based UDAF
    val scanner = params.scanner
    val agg = udaf(graft.taxa.TaxonLcaAggregator(bcTax))
    val viaUdaf = lib.flatMap { case (taxon, seq) =>
      scanner.scan(seq).map(sm => (sm.minimizer, taxon))
    }.toDF("id1", "taxon")
      .groupBy($"id1").agg(agg($"taxon").as("taxon"))
      .as[(Long, Int)].collect().toMap
    assert(native == viaUdaf)
  }

  test("salted two-stage LCA build equals the single-stage build") {
    import spark.implicits._
    val lib = spark.createDataset(genomes.toSeq ++ Seq(
      (5, genomes(4)), (6, genomes(4)))) // force multi-taxon minimizers
    val plain = index.makeRecords(lib).as[(Long, Int)].collect().toMap
    val salted = index.makeRecords(lib, saltBuckets = 7)
      .as[(Long, Int)].collect().toMap
    assert(salted == plain)
  }

  test("2-bit packed build produces identical records to the string build") {
    import spark.implicits._
    // include ambiguous bases so packing must split runs first
    val withN = genomes(4).substring(0, 1500) + "NNN" + genomes(4).substring(1500)
    val lib = spark.createDataset(Seq(
      (4, withN), (5, genomes(5)), (6, genomes(6))))
    val viaString = index.makeRecords(lib).as[(Long, Int)].collect().toMap
    val viaPacked = index.makeRecordsPacked(index.packLibrary(lib))
      .as[(Long, Int)].collect().toMap
    assert(viaPacked == viaString)
    // salted fold works over packed input too
    val salted = index.makeRecordsPacked(index.packLibrary(lib), saltBuckets = 5)
      .as[(Long, Int)].collect().toMap
    assert(salted == viaString)
  }

  test("undefined label taxa yield zero records and no ROOT lift") {
    import spark.implicits._
    // 999 is not in the taxonomy (stale seqid2taxid entry). Its sequence —
    // which overlaps genome 4 — must contribute nothing: no records of its
    // own, and no ROOT-lifting of minimizers it shares with taxon 4.
    val lib = spark.createDataset(Seq((4, genomes(4)), (999, genomes(4))))
    val recs = index.makeRecords(lib).as[(Long, Int)].collect().toMap
    val expected = index.makeRecords(
      spark.createDataset(Seq((4, genomes(4))))).as[(Long, Int)].collect().toMap
    assert(recs == expected)
    assert(!recs.values.exists(_ == Taxonomy.ROOT))
    // a library of ONLY undefined taxa builds an empty index
    val empty = index.makeRecords(spark.createDataset(Seq((999, genomes(4))))).count()
    assert(empty == 0)
  }

  test("shared minimizers get the LCA of their taxa") {
    import spark.implicits._
    // construct a library where one sequence is shared between taxa 4 and 5
    val shared = randomDna(200)
    val lib = spark.createDataset(Seq((4, shared), (5, shared), (6, randomDna(200))))
    val recs = index.makeRecords(lib).as[(Long, Int)].collect().toMap
    val scanner = params.scanner
    for (sm <- scanner.scan(shared))
      assert(recs(sm.minimizer) == 2, s"shared minimizer should lift to genus 2")
  }

  test("classification maps reads to source taxon or ancestor") {
    import spark.implicits._
    val reads = (0 until 200).map { i =>
      val taxon = Seq(4, 5, 6)(rng.nextInt(3))
      val g = genomes(taxon)
      val start = rng.nextInt(g.length - 150)
      InputFragment(s"read$i|src=$taxon", 0L, g.substring(start, start + 150), None)
    }
    val classified = index
      .classify(index.spans(spark.createDataset(reads)), records)
      .collect()
    assert(classified.length == 200)
    val byTitle = classified.map(c => c.title -> c).toMap
    var nClassified = 0
    for (r <- reads) {
      val c = byTitle(r.header)
      val src = r.header.split("src=")(1).toInt
      if (c.classified) {
        nClassified += 1
        assert(tax.hasAncestor(src, c.taxon),
          s"${c.title}: got ${c.taxon}, not an ancestor of $src")
      }
    }
    // random 4kb genomes: 150bp reads should classify nearly always
    assert(nClassified > 180)
  }

  test("paired-end reads classify with mate-pair border protocol") {
    import spark.implicits._
    val g = genomes(6)
    val reads = (0 until 30).map { i =>
      val s1 = rng.nextInt(g.length - 300)
      InputFragment(s"pair$i", 0L, g.substring(s1, s1 + 120),
        Some(Dna.reverseComplement(g.substring(s1 + 150, s1 + 270))))
    }
    val classified = index
      .classify(index.spans(spark.createDataset(reads)), records)
      .collect()
    for (c <- classified if c.classified)
      assert(tax.hasAncestor(6, c.taxon))
    assert(classified.count(_.classified) > 25)
    // the hit string shows the mate border sentinel
    assert(classified.exists(_.hits.contains("|:|")))
  }

  test("multi-threshold sweep reuses one hit dataset, agrees with single runs") {
    import spark.implicits._
    val reads = (0 until 60).map { i =>
      val g = genomes(5)
      val start = rng.nextInt(g.length - 150)
      InputFragment(s"mt$i", 0L, g.substring(start, start + 150), None)
    }
    val ds = spark.createDataset(reads)
    val sp = index.spans(ds)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    index.classifyMultiThreshold(sp, records, Seq(0.0, 0.5, 0.95)) { multi =>
      assert(multi.map(_._1) == Seq(0.0, 0.5, 0.95))
      for ((conf, result) <- multi) {
        val single = index.classify(index.spans(ds), records, confidence = conf)
          .collect().map(c => c.title -> c.taxon).toMap
        val got = result.collect().map(c => c.title -> c.taxon).toMap
        assert(got == single, s"threshold $conf")
      }
      // monotone: higher confidence never classifies more reads
      val counts = multi.map(_._2.collect().count(_.classified))
      assert(counts == counts.sorted.reverse)
    }
    // the sweep's cached hit dataset is released on the way out
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore)
  }

  test("confidence threshold forces unclassified on weak evidence") {
    import spark.implicits._
    // chimeric read: half from genome 4, half random junk
    val g = genomes(4)
    val reads = (0 until 20).map { i =>
      val start = rng.nextInt(g.length - 80)
      InputFragment(s"chi$i", 0L, g.substring(start, start + 80) + randomDna(80), None)
    }
    val ds = spark.createDataset(reads)
    val loose = index.classify(index.spans(ds), records, confidence = 0.0).collect()
    val strict = index.classify(index.spans(ds), records, confidence = 0.9).collect()
    assert(loose.count(_.classified) >= strict.count(_.classified))
    assert(strict.count(_.classified) < 5)
  }

  test("ambiguous bases form pseudo-spans, excluded from scoring") {
    import spark.implicits._
    val g = genomes(5)
    val read = g.substring(0, 80) + ("N" * 50) + g.substring(100, 180)
    val spans = index.fragmentSpans(InputFragment("amb", 0L, read, None)).toVector
    assert(spans.exists(_.flag == graft.taxa.Sentinels.AMBIGUOUS_FLAG))
    val classified = index
      .classify(index.spans(spark.createDataset(Seq(
        InputFragment("amb", 0L, read, None)))), records)
      .collect()
    assert(classified.head.classified && tax.hasAncestor(5, classified.head.taxon))
    assert(classified.head.hits.contains("A:"))
  }

  test("degenerate inputs: empty library, sub-k reads, N-only reads") {
    import spark.implicits._
    // empty library -> zero records, classification still runs (all U)
    val emptyRecords = index.makeRecords(
      spark.createDataset(Seq.empty[(Int, String)]))
    assert(emptyRecords.count() == 0)
    val reads = Seq(
      InputFragment("short", 0L, "ACGT", None), // < k: no spans at all
      InputFragment("ns", 0L, "N" * 80, None), // ambiguous-only
      InputFragment("normal", 0L, genomes(4).substring(0, 120), None))
    val ds = spark.createDataset(reads)
    val vsEmpty = index.classify(index.spans(ds), emptyRecords).collect()
    // sub-k fragments produce no spans -> absent from output; the rest are U
    assert(vsEmpty.map(_.title).toSet == Set("ns", "normal"))
    assert(vsEmpty.forall(!_.classified))
    // against the real index, the N-only read stays unclassified, the
    // normal read classifies, the short read still yields no row
    val vsReal = index.classify(index.spans(ds), records).collect()
      .map(c => c.title -> c.classified).toMap
    assert(vsReal == Map("ns" -> false, "normal" -> true))
  }

  test("index table names never collide on 32-bit path-hash collisions") {
    // "Aa"/"BB" is the canonical String.hashCode collision; build two path
    // pairs around it — the old Integer.toHexString(path.hashCode) scheme
    // maps each pair to ONE table name, cross-wiring two open indexes
    val pairs = Seq(
      ("/data/idx/Aa", "/data/idx/BB"),
      ("/tmp/AaAa/index", "/tmp/BBBB/index"))
    for ((p1, p2) <- pairs) {
      assert(p1.hashCode == p2.hashCode, "fixture must collide in hashCode")
      val (t1, t2) = (MinimizerIndex.tableName(p1), MinimizerIndex.tableName(p2))
      assert(t1 != t2, s"table names collide: $t1")
      // catalog-safe identifiers
      assert(t1.matches("[A-Za-z_][A-Za-z0-9_]*"), t1)
    }
    // determinism: the same path always maps to the same table
    assert(MinimizerIndex.tableName("/a/b") == MinimizerIndex.tableName("/a/b"))
  }

  test("bucketed write + DDL reload roundtrip preserves records") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString + "/index"
    index.writeRecords(records, dir)
    val (idx2, reloaded) = MinimizerIndex.open(spark, dir, bcTax)
    assert(idx2.loadRecords(spark, dir).count() == records.count())
    assert(reloaded.as[(Long, Int)].collect().toMap ==
      records.as[(Long, Int)].collect().toMap)
    // classification against the reloaded index gives identical results
    val reads = (0 until 40).map { i =>
      val g = genomes(4)
      val start = rng.nextInt(g.length - 150)
      InputFragment(s"rl$i", 0L, g.substring(start, start + 150), None)
    }
    val a = index.classify(index.spans(spark.createDataset(reads)), records)
      .collect().map(c => c.title -> c.taxon).toMap
    val b = idx2.classify(idx2.spans(spark.createDataset(reads)), reloaded)
      .collect().map(c => c.title -> c.taxon).toMap
    assert(a == b)
  }

  test("kreport emits sub-rank codes for unranked taxa (G1, G2, ...)") {
    // genus 2 <- no-rank 3 <- no-rank 4 <- species 5
    val t = Taxonomy.fromTuples(Seq(
      (2, 1, "genus", "g"),
      (3, 2, "no rank", "strain-group"),
      (4, 3, "no rank", "strain"),
      (5, 4, "species", "sp")))
    val rep = new KrakenReport(t, Array((5, 10L), (3, 2L), (0, 1L)))
    val lines = rep.lines.toVector
    def row(taxid: Int): Array[String] =
      lines.find(_.split("\t")(4) == taxid.toString).get.split("\t")
    assert(lines.head.split("\t")(3) == "U") // unclassified first
    assert(row(1)(3) == "R")
    assert(row(2)(3) == "G")
    assert(row(3)(3) == "G1")
    assert(row(4)(3) == "G2")
    assert(row(5)(3) == "S")
    // clade counts aggregate upward through the unranked chain
    assert(row(3)(1).toLong == 12L && row(5)(1).toLong == 10L)
    // indentation deepens along the path
    assert(row(4)(5).takeWhile(_ == ' ').length >
      row(3)(5).takeWhile(_ == ' ').length)
  }

  test("per-sample kreport files are written, one per extracted sample") {
    import spark.implicits._
    val reads = (0 until 40).map { i =>
      val taxon = Seq(4, 5, 6)(i % 3)
      val g = genomes(taxon)
      val start = rng.nextInt(g.length - 150)
      InputFragment(s"S${i % 2}R$i", 0L, g.substring(start, start + 150), None)
    }
    val classified = index.classify(index.spans(spark.createDataset(reads)), records)
    val dir = java.nio.file.Files.createTempDirectory("graft-ksamp").toString
    IndexOps.writePerSampleReports(classified, "(S\\d)R", dir, bcTax)
    for (s <- Seq("S0", "S1")) {
      val p = java.nio.file.Paths.get(dir, s"$s.kreport.txt")
      assert(java.nio.file.Files.exists(p), s"missing $p")
      val content = java.nio.file.Files.readString(p)
      assert(content.contains("\tR\t") || content.contains("\tU\t"))
    }
  }

  test("kreport clade counts aggregate to ancestors") {
    import spark.implicits._
    val reads = (0 until 90).map { i =>
      val taxon = Seq(4, 5, 6)(i % 3)
      val g = genomes(taxon)
      val start = rng.nextInt(g.length - 150)
      InputFragment(s"rep$i", 0L, g.substring(start, start + 150), None)
    }
    val classified = index.classify(index.spans(spark.createDataset(reads)), records)
    val rep = index.report(classified)
    // clade count at root equals total classified
    val classifiedCount = classified.collect().count(_.classified)
    assert(rep.cladeCounts(Taxonomy.ROOT) == classifiedCount)
    // genus 2's clade includes species 4 and 5
    assert(rep.cladeCounts.getOrElse(2, 0L) >=
      rep.countMap.getOrElse(4, 0L) + rep.countMap.getOrElse(5, 0L))
    assert(rep.render.nonEmpty)
  }
}
