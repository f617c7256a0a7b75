package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper

/** Reproduces the reference's PUBLISHED golden numbers for its tiny test
  * dataset from the real `.fai` + `seqid2taxid.map` it ships (the sequence
  * bytes are not in the sandbox, but this golden was derived by the
  * reference authors from the .fai alone — "Manually calculated from the
  * .fai files", reference Testing.scala:159-165):
  *
  *   length-100 reads per taxon = 455631 -> 4,126,265; 526997 -> 3,070,413;
  *   9606 -> 799,821.
  *
  * What this pins on OUR side, against data we did not synthesize:
  *   - [[IndexedFasta.readFai]] parses real faidx content — kraken-style
  *     `kraken:taxid|…|accession` names (the '|' characters must survive),
  *     two line geometries in one file (72/73 bacterial, 80/81 human);
  *   - [[Sequences.labels]] joins that namespace to taxa;
  *   - [[IndexedFasta.planSplits]] covers every k-mer window of every
  *     sequence exactly once (the k-1-overlap fragment math the classify
  *     pipeline trusts at 100 GB-genome scale).
  */
class ReferenceFaiGoldenSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val faiPath = "/root/reference/testData/slacken/slacken_tinydata.fna.fai"
  private val mapPath = "/root/reference/testData/slacken/seqid2taxid.map"

  private val golden = Map(455631 -> 4126265L, 526997 -> 3070413L, 9606 -> 799821L)

  test("readFai parses the reference-published .fai (17 entries, both line geometries)") {
    val entries = IndexedFasta.readFai(spark, faiPath)
    assert(entries.length === 17)
    assert(entries.forall(_.name.startsWith("kraken:taxid|")))
    assert(entries.map(e => (e.lineBases, e.lineWidth)).toSet === Set((72, 73), (80, 81)))
    // offsets are strictly increasing and consistent with the line geometry:
    // each sequence's bases + line terminators fit before the next offset
    val sorted = entries.sortBy(_.offset)
    for (Seq(a, b) <- sorted.sliding(2)) {
      val lines = (a.length + a.lineBases - 1) / a.lineBases
      val bytes = a.length + lines * (a.lineWidth - a.lineBases)
      assert(a.offset + bytes <= b.offset,
        s"${a.name}: ${a.length} bases at ${a.offset} overruns ${b.name} at ${b.offset}")
    }
  }

  test("length-100 read counts per taxon match the reference's published golden") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val readLen = 100
    val fai = IndexedFasta.readFai(spark, faiPath)
      .map(e => (e.name, e.length)).toDF("header", "length")
    val counts = fai
      .join(Sequences.labels(spark, mapPath), Seq("header"))
      .groupBy($"taxon")
      .agg(sum(greatest($"length" - (readLen - 1), lit(0L))).as("n_reads"))
      .as[(Int, Long)].collect().toMap
    assert(counts === golden)
  }

  test("planSplits covers every k-mer window of every real sequence exactly once") {
    val k = 35
    val maxFragment = 100000
    val entries = IndexedFasta.readFai(spark, faiPath)
    for (e <- entries) {
      val splits = IndexedFasta.planSplits("f", Seq(e), k, maxFragment)
      // every k-mer start position lands in >= 1 split; counting each
      // split's complete windows sums to exactly len-k+1 (no window lost at
      // a border, none double-counted by the k-1 overlap)
      val windowTotal = splits.map { s =>
        math.max(0L, (s.baseEnd - s.baseStart) - (k - 1))
      }.sum
      assert(windowTotal === math.max(0L, e.length - k + 1),
        s"${e.name}: window count off (${splits.length} splits)")
      // split bounds stay inside the sequence and splits are k-1-overlapped
      assert(splits.forall(s => s.baseStart >= 0 && s.baseEnd <= e.length))
      for (Seq(a, b) <- splits.sortBy(_.baseStart).sliding(2)
           if splits.length > 1)
        assert(b.baseStart === a.baseEnd - (k - 1),
          s"${e.name}: fragment border gap between ${a.baseEnd} and ${b.baseStart}")
    }
  }
}
