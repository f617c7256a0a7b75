package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.util.Random

/** End-to-end CLI: build an index from FASTA + labels + taxonomy dumps,
  * run a multi-threshold classify sweep, and compare against ground truth
  * (the reference tool's command surface driven exactly as a user would). */
class CliSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val rng = new Random(11)
  def dna(n: Int): String = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  def write(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("CLI: build -> classify -c sweep -> compare") {
    spark // init the shared session first so Main.session getOrCreate reuses it
    val dir = Files.createTempDirectory("graft-cli")
    val genomes = Map(4 -> dna(3000), 5 -> dna(3000))

    write(dir.resolve("lib.fasta"),
      s">s4\n${genomes(4)}\n>s5\n${genomes(5)}\n")
    write(dir.resolve("labels.tsv"), "s4\t4\ns5\t5\n")
    write(dir.resolve("tax/nodes.dmp"),
      "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n" +
        "4\t|\t2\t|\tspecies\t|\n5\t|\t2\t|\tspecies\t|\n")
    write(dir.resolve("tax/names.dmp"),
      "1\t|\troot\t|\t\t|\tscientific name\t|\n" +
        "2\t|\tgenus g\t|\t\t|\tscientific name\t|\n" +
        "4\t|\tspecies four\t|\t\t|\tscientific name\t|\n" +
        "5\t|\tspecies five\t|\t\t|\tscientific name\t|\n")

    val idx = dir.resolve("idx").toString
    Main.main(Array("build", "--k", "35", "--m", "31", "--s", "7", "--p", "4",
      "--library", dir.resolve("lib.fasta").toString,
      "--labels", dir.resolve("labels.tsv").toString,
      "--taxonomy", dir.resolve("tax").toString,
      "--output", idx))
    assert(Files.exists(java.nio.file.Paths.get(idx, "_index.properties")))

    // reads: substrings of known genomes, sample id + truth taxon in title
    val fqSb = new StringBuilder
    val truthSb = new StringBuilder
    for (i <- 0 until 40) {
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 150)
      val title = s"S${i % 2}R$i"
      fqSb.append(s"@$title\n${g.substring(s, s + 150)}\n+\n")
        .append("I" * 150).append('\n')
      truthSb.append(s"$title\t$t\n")
    }
    write(dir.resolve("reads.fastq"), fqSb.toString)
    write(dir.resolve("truth.tsv"), truthSb.toString)

    val out = dir.resolve("out").toString
    Main.main(Array("classify", "--index", idx,
      "--taxonomy", dir.resolve("tax").toString,
      "--reads", dir.resolve("reads.fastq").toString,
      "--c", "0.0,0.9", "--min-hit-groups", "1",
      "--sample-regex", "(S\\d)R",
      "--output", out))
    // per-threshold output dirs, partitioned by extracted sample
    for (c <- Seq("0.0", "0.9"); s <- Seq("S0", "S1"))
      assert(Files.exists(java.nio.file.Paths.get(s"$out/c$c", s"sample=$s")),
        s"missing $out/c$c/sample=$s")
    // per-sample kreports were written for each threshold
    assert(Files.exists(java.nio.file.Paths.get(s"$out/c0.0_reports",
      "S0.kreport.txt")))

    // compare: read back one threshold's PARTITIONED output root (the
    // documented flow — partition discovery appends a `sample` column that
    // readKrakenOutput must ignore) vs truth at species rank
    Main.main(Array("compare",
      "--taxonomy", dir.resolve("tax").toString,
      "--classified", s"$out/c0.0",
      "--truth", dir.resolve("truth.tsv").toString,
      "--rank", "species",
      "--output", dir.resolve("cmp").toString))
    val cmpFiles = Files.list(dir.resolve("cmp")).toArray.map(_.toString)
    assert(cmpFiles.exists(_.contains("part-")))
    // clean reads from distinct random genomes: every read classifies TP,
    // and BOTH samples came through the partitioned read (40 reads total)
    val cats = cmpFiles.filter(_.endsWith(".csv"))
      .flatMap(f => scala.jdk.CollectionConverters
        .ListHasAsScala(Files.readAllLines(java.nio.file.Paths.get(f))).asScala)
    assert(cats.length == 40)
    assert(cats.forall(_.endsWith("\tTP")))
    // the sweep wrote REAL hit-detail strings (column 5 non-empty), not the
    // detail-free internal sweep representation
    val krakenLines = Files.list(java.nio.file.Paths.get(s"$out/c0.0/sample=S0"))
      .toArray.map(_.toString).filter(_.endsWith(".gz"))
      .flatMap { f =>
        val in = new java.util.zip.GZIPInputStream(
          java.nio.file.Files.newInputStream(java.nio.file.Paths.get(f)))
        try scala.io.Source.fromInputStream(in).getLines().toVector
        finally in.close()
      }
    assert(krakenLines.nonEmpty)
    assert(krakenLines.forall(_.split("\t", -1)(4).nonEmpty))
  }

  test("CLI: wide (m=33) salted build -> classify2 -> bracken") {
    spark
    val dir = Files.createTempDirectory("graft-cli-wide")
    val genomes = Map(4 -> dna(3000), 5 -> dna(3000))

    write(dir.resolve("lib.fasta"),
      s">s4\n${genomes(4)}\n>s5\n${genomes(5)}\n")
    write(dir.resolve("labels.tsv"), "s4\t4\ns5\t5\n")
    write(dir.resolve("tax/nodes.dmp"),
      "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n" +
        "4\t|\t2\t|\tspecies\t|\n5\t|\t2\t|\tspecies\t|\n")
    write(dir.resolve("tax/names.dmp"),
      "1\t|\troot\t|\t\t|\tscientific name\t|\n" +
        "2\t|\tgenus g\t|\t\t|\tscientific name\t|\n" +
        "4\t|\tspecies four\t|\t\t|\tscientific name\t|\n" +
        "5\t|\tspecies five\t|\t\t|\tscientific name\t|\n")

    val idx = dir.resolve("idx").toString
    Main.main(Array("build", "--k", "35", "--m", "33", "--p", "4", "--salt", "3",
      "--library", dir.resolve("lib.fasta").toString,
      "--labels", dir.resolve("labels.tsv").toString,
      "--taxonomy", dir.resolve("tax").toString,
      "--output", idx))
    assert(graft.index.IndexParams.read(spark, idx).m == 33)

    val fqSb = new StringBuilder
    val fq2Sb = new StringBuilder
    for (i <- 0 until 30) {
      val t = if (i % 2 == 0) 4 else 5
      val g = genomes(t)
      val s = rng.nextInt(g.length - 150)
      val s2 = rng.nextInt(g.length - 150)
      fqSb.append(s"@wr$i/1\n${g.substring(s, s + 150)}\n+\n")
        .append("I" * 150).append('\n')
      fq2Sb.append(s"@wr$i/2\n${g.substring(s2, s2 + 150)}\n+\n")
        .append("I" * 150).append('\n')
    }
    write(dir.resolve("reads.fastq"), fqSb.toString)
    write(dir.resolve("reads2.fastq"), fq2Sb.toString)

    // paired-end classify over the wide index (mate-border protocol via CLI)
    val outP = dir.resolve("outp").toString
    Main.main(Array("classify", "--index", idx,
      "--taxonomy", dir.resolve("tax").toString,
      "--reads", dir.resolve("reads.fastq").toString,
      "--reads2", dir.resolve("reads2.fastq").toString,
      "--min-hit-groups", "1",
      "--output", outP))
    val pairedLines = Files.list(java.nio.file.Paths.get(outP, "sample=wr0"))
      .toArray.map(_.toString).filter(_.endsWith(".gz"))
      .flatMap { f =>
        val in = new java.util.zip.GZIPInputStream(
          java.nio.file.Files.newInputStream(java.nio.file.Paths.get(f)))
        try scala.io.Source.fromInputStream(in).getLines().toVector
        finally in.close()
      }
    // the pair classifies as ONE record with a mate border in the hits
    assert(pairedLines.length == 1)
    assert(pairedLines.head.startsWith("C\t"))
    assert(pairedLines.head.contains("|:|"))

    // 2-step dynamic classification over the wide index
    val out2 = dir.resolve("out2").toString
    Main.main(Array("classify2", "--index", idx,
      "--taxonomy", dir.resolve("tax").toString,
      "--library", dir.resolve("lib.fasta").toString,
      "--labels", dir.resolve("labels.tsv").toString,
      "--reads", dir.resolve("reads.fastq").toString,
      "--threshold", "10", "--bracken-read-len", "100",
      "--output", out2))
    assert(Files.list(java.nio.file.Paths.get(out2)).toArray.nonEmpty)
    // dynamic-index bracken weights were written alongside
    assert(Files.list(java.nio.file.Paths.get(out2 + "_weights")).toArray
      .map(_.toString).exists(_.endsWith(".csv")))

    // width-agnostic stats over the wide index
    val statsOut = dir.resolve("stats").toString
    Main.main(Array("stats", "--index", idx,
      "--taxonomy", dir.resolve("tax").toString,
      "--output", statsOut))
    assert(Files.list(java.nio.file.Paths.get(statsOut)).toArray
      .map(_.toString).exists(_.endsWith(".csv")))

    // bracken weights over the wide index
    val outW = dir.resolve("weights").toString
    Main.main(Array("bracken", "--index", idx,
      "--taxonomy", dir.resolve("tax").toString,
      "--library", dir.resolve("lib.fasta").toString,
      "--labels", dir.resolve("labels.tsv").toString,
      "--read-len", "100",
      "--output", outW))
    val lines = Files.list(java.nio.file.Paths.get(outW)).toArray
      .map(_.toString).filter(_.endsWith(".csv"))
      .flatMap(f => scala.jdk.CollectionConverters
        .ListHasAsScala(Files.readAllLines(java.nio.file.Paths.get(f))).asScala)
    assert(lines.nonEmpty)
    for (l <- lines) assert(l.matches("-?[0-9]+\t[0-9]+:[0-9]+:[0-9.]+( .*)?"), l)
  }
}
