package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper

/** The packing kernel's group count is a parallelism parameter, not a
  * semantic one: t27 pins the 256-group (hexChars=2) oracle, and this spec
  * drives the SAME kernel at the 4096-group width a large cluster wants,
  * against a from-scratch driver-side reference. */
class PackBinsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("packBins at hexChars=3 (4096 groups) matches a brute-force " +
    "reference and widens the group space") {
    import spark.implicits._
    val budget = 50L
    val docs = (0L until 3000L).map { i =>
      val words = 1 + (graft.functions.TextAnalysis.mix64(i) & 31L).toInt
      (i, (0 until words).map(j => s"w${i}_$j").mkString(" "))
    }
    val df = spark.createDataset(docs).toDF("doc_id", "text")
    val got = TextQueries.packBins(df, budget, hexChars = 3)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // brute force: md5-prefix groups, doc_id order, greedy running-sum bins
    val byGroup = docs
      .map { case (id, text) => (md5Hex(id.toString).take(3), id,
        text.split(" ").length.toLong) }
      .groupBy(_._1)
    // NB: flatMap must run on a Seq — on the Map itself the ((grp, bin), n)
    // pairs would collapse by key and silently drop docs
    val want = byGroup.toSeq.flatMap { case (grp, rows) =>
      var cum = 0L
      rows.sortBy(_._2).map { case (_, _, n) =>
        val bin = cum / budget
        cum += n
        ((grp, bin), n)
      }
    }.groupBy(_._1)
      .map { case (k, vs) => k -> (vs.size.toLong, vs.map(_._2).sum) }
    assert(got == want)
    val groups = got.keySet.map(_._1)
    assert(groups.forall(_.length == 3))
    assert(groups.size > 256,
      s"3-hex-char packing only produced ${groups.size} groups")
    // conservation: every token lands in exactly one bin
    assert(got.values.map(_._2).sum ==
      docs.map(_._2.split(" ").length.toLong).sum)
  }
}
