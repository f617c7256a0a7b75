package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionTestWrapper

/** Mixture-allocation (t33) and Bloom-decontamination (t34) kernels. */
class CurationOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("mixture weights match an exact BigInt reimplementation") {
    // deterministic word-salad docs over 4 sources with skewed volumes
    val rows = (0L until 200L).map { i =>
      val src = s"s${Seq(0, 0, 0, 1, 1, 2, 3)((i % 7).toInt)}"
      val words = (0L to i % 23).map(j => s"w${(i * 31 + j) % 97}")
      (i, words.mkString(" "), src)
    }
    val budget = 10000L
    val got = TextQueries.mixtureWeights(docs(rows), budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // independent driver-side recomputation in BigInt
    val bySrc = rows.groupBy(_._3).view.mapValues { ds =>
      (ds.size.toLong,
        ds.map(d => if (d._2.trim.isEmpty) 0L
          else d._2.trim.count(_ == ' ').toLong + 1L).sum)
    }.toMap
    val wts = bySrc.view.mapValues { case (_, tok) =>
      math.floor(math.sqrt(tok.toDouble)).toLong }.toMap
    val tw = wts.values.sum
    for ((src, nDocs, nTok, wt, alloc, epochs) <- got) {
      assert(nDocs == bySrc(src)._1)
      assert(nTok == bySrc(src)._2)
      assert(wt == wts(src))
      val wantAlloc = ((BigInt(2) * budget * wt + tw) / (BigInt(2) * tw)).toLong
      assert(alloc == wantAlloc, s"$src alloc")
      // within the round-to-4dp quantum of the exact ratio
      assert(math.abs(epochs - wantAlloc.toDouble / nTok) < 5.1e-5)
    }
    // allocations track the budget (round-half-up keeps the sum within
    // |sources|/2 of it)
    val total = got.map(_._5).sum
    assert(math.abs(total - budget) <= got.length, s"sum=$total")
  }

  test("PII redaction handles hand-computed cases exactly") {
    import spark.implicits._
    val cases = Seq(
      // (input, expected redaction)
      ("write to a.b+c@ex-1.org now", "write to <EMAIL> now"),
      ("peer 10.0.0.1 and 255.999.1.23", "peer <IP> and <IP>"),
      ("call 555-0199 x2", "call <PHONE> x2"),
      ("all: x@y.io 1.2.3.4 555-1234", "all: <EMAIL> <IP> <PHONE>"),
      // 4-digit octet is not an IP (\b\d{1,3} cannot start inside 1234)
      ("not an ip 1234.5.6.7 here", "not an ip 1234.5.6.7 here"),
      // all-numeric host is NOT an email (TLD needs letters); the ip
      // pass then picks up the host
      ("u@1.2.3.4 is no email", "u@<IP> is no email"),
      ("nothing to scrub", "nothing to scrub"))
    val got = cases.map(_._1).toDF("t")
      .select(TextQueries.redactPii($"t")).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("bloom prefilter + exact confirm equals the plain join on planted contamination") {
    import spark.implicits._
    // eval set: 5 docs; corpus: 40 docs, of which 10 embed a full eval
    // 5-gram span and 30 are clean
    val evalRows = (0L until 5L).map { i =>
      (i, (0 until 12).map(j => s"ev${i}_$j").mkString(" "), "eval")
    }
    val corpusRows = (100L until 140L).map { i =>
      val clean = (0 until 20).map(j => s"c${i}_$j")
      val text = if (i < 110) {
        // splice an 6-word eval window => 2 contaminated 5-gram positions
        val ev = (3 until 9).map(j => s"ev${i % 5}_$j")
        (clean.take(7) ++ ev ++ clean.drop(7)).mkString(" ")
      } else clean.mkString(" ")
      (i, text, "corpus")
    }
    val out = TextQueries.bloomDecon(docs(corpusRows), docs(evalRows))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 40)
    // plain-join truth, recomputed on the driver
    def grams(text: String) =
      text.split(" ").sliding(5).map(_.mkString(" ")).toSeq
    val evSet = evalRows.flatMap(r => grams(r._2)).toSet
    for ((id, nGrams, nContam, keep) <- out) {
      val text = corpusRows.find(_._1 == id).get._2
      val g = grams(text)
      assert(nGrams == g.length, s"doc $id gram count")
      assert(nContam == g.count(evSet), s"doc $id contamination")
      assert(keep == (nContam == 0L))
    }
    assert(out.count(!_._4) == 10, "exactly the spliced docs are dropped")
  }

  test("bloom prefilter prunes: clean corpus grams never reach the confirm join") {
    import spark.implicits._
    // no contamination at all: the bloom side sees disjoint vocabulary, so
    // (up to ~1e-5 fp) zero grams survive to the join — every doc keeps
    val evalRows = (0L until 5L).map { i =>
      (i, (0 until 30).map(j => s"ev${i}_$j").mkString(" "), "eval")
    }
    val corpusRows = (100L until 150L).map { i =>
      (i, (0 until 30).map(j => s"c${i}_$j").mkString(" "), "corpus")
    }
    val out = TextQueries.bloomDecon(docs(corpusRows), docs(evalRows))
      .collect()
    assert(out.length == 50)
    assert(out.forall(_.getBoolean(3)), "clean corpus must keep everything")
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("temperature sampling: kept fraction tracks the allocation target " +
    "and the keep set is deterministic across partitionings") {
    // one dominant source (flattened down) and two small ones (kept whole)
    val rows = (0L until 3000L).map { i =>
      val src = if (i % 10 < 8) "big" else if (i % 10 == 8) "mid" else "small"
      val words = (0L until 5L + i % 7).map(j => s"w${(i * 13 + j) % 53}")
      (i, words.mkString(" "), src)
    }
    val d = docs(rows)
    val got = TextQueries.temperatureSample(d, budget = 8000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == Set("big", "mid", "small"))
    for ((src, (nDocs, nKept, keptToks, target)) <- got) {
      assert(nKept <= nDocs)
      assert(keptToks >= 0)
      if (target >= 1.0) assert(nKept == nDocs, s"$src: full keep expected")
      else {
        // md5 is uniform: the kept fraction concentrates around the target
        val frac = nKept.toDouble / nDocs
        assert(math.abs(frac - target) < 0.05,
          s"$src kept $frac vs target $target")
      }
    }
    // the dominant source is actually downsampled; epochs-over-small kept
    assert(got("big")._2 < got("big")._1)
    // determinism: same answer from a different partitioning
    val again = TextQueries.temperatureSample(d.repartition(7), budget = 8000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(again == got)
  }
}
