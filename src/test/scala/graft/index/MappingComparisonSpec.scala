package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.taxa.Taxonomy

class MappingComparisonSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val tax = Taxonomy.fromTuples(Seq(
    (2, 1, "genus", "g1"), (3, 1, "genus", "g2"),
    (4, 2, "species", "s4"), (5, 2, "species", "s5"), (6, 3, "species", "s6")))
  lazy val bcTax = spark.sparkContext.broadcast(tax)

  def classified(rows: (String, Int)*) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (t, x) =>
      ClassifiedRead(t, x != Taxonomy.NONE, x, 100, "")
    })
  }

  def truth(rows: (String, Int)*) = {
    import spark.implicits._
    rows.toDF("title", "taxon")
  }

  test("read categories: TP at rank, VP above rank, FP wrong clade, FN unclassified") {
    val c = classified(("r1", 4), ("r2", 2), ("r3", 6), ("r4", 0), ("r5", 5))
    val t = truth(("r1", 4), ("r2", 4), ("r3", 4), ("r4", 4), ("r5", 4))
    val cats = MappingComparison.categorize(c, t, bcTax, "species")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(cats("r1") == "TP") // exact species
    assert(cats("r2") == "VP") // genus-level: above species rank, right clade
    assert(cats("r3") == "FP") // wrong clade
    assert(cats("r4") == "FN") // unclassified
    assert(cats("r5") == "FP") // sibling species
  }

  test("foreign/stale taxon ids categorize as NA instead of crashing") {
    // taxid 2000000 is outside this taxonomy's array
    val c = classified(("r1", 2000000), ("r2", 4), ("r3", 4), ("r4", 0))
    val t = truth(("r1", 4), ("r2", 2000000), ("r3", 4), ("r4", 2000000))
    val cats = MappingComparison.categorize(c, t, bcTax, "species")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(cats("r1") == "NA" && cats("r2") == "NA" && cats("r3") == "TP")
    // an invalid EXPECTATION is NA even when the read is unclassified —
    // never FN, which would bias the sensitivity denominator
    assert(cats("r4") == "NA")
    // taxon metrics likewise skip foreign ids rather than walking off the array
    val (_, _, det, tru) = MappingComparison.taxonMetrics(
      c, t, bcTax, "species", minReads = 1)
    assert(det == Set(4) && tru == Set(4))
  }

  test("malformed truth lines (non-numeric taxon) are dropped, not fatal") {
    import spark.implicits._
    val c = classified(("r1", 4), ("r2", 5))
    val t = Seq(("title", "taxon"), ("r1", "4")) // header line in the file
      .toDF("title", "taxon")
    val cats = MappingComparison.categorize(c, t, bcTax, "species")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(cats == Map("r1" -> "TP"))
    val (precision, recall, det, tru) = MappingComparison.taxonMetrics(
      c, t, bcTax, "species", minReads = 1)
    assert(tru == Set(4) && det == Set(4, 5))
    assert(recall == 1.0 && math.abs(precision - 0.5) < 1e-12)
  }

  test("read metrics: ppv and sensitivity") {
    val c = classified(("r1", 4), ("r2", 4), ("r3", 5), ("r4", 0))
    val t = truth(("r1", 4), ("r2", 4), ("r3", 4), ("r4", 4))
    val m = MappingComparison.readMetrics(
      MappingComparison.categorize(c, t, bcTax, "species")).collect()(0)
    assert(math.abs(m.getDouble(0) - 0.6667) < 1e-4) // ppv = tp/(tp+fp), rounded
    assert(m.getDouble(1) == 0.5) // sensitivity = tp/total
  }

  test("taxon metrics: precision/recall over detected vs truth sets") {
    val c = classified(("r1", 4), ("r2", 4), ("r3", 6), ("r4", 5))
    val t = truth(("x1", 4), ("x2", 6))
    val (precision, recall, det, tru) = MappingComparison.taxonMetrics(
      c, t, bcTax, "species", minReads = 1)
    assert(det == Set(4, 5, 6) && tru == Set(4, 6))
    assert(math.abs(precision - 2.0 / 3.0) < 1e-9)
    assert(recall == 1.0)
  }

  test("kraken output roundtrip: written lines parse back") {
    import spark.implicits._
    val c = classified(("read a", 4), ("read b", 0))
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp").toString + "/out"
    IndexOps.writePerSampleOutput(c, None, dir, maxPartitions = 1)
    val back = MappingComparison.readKrakenOutput(spark, dir + "/sample=*")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(back == Map("read a" -> 4, "read b" -> 0))
  }
}
