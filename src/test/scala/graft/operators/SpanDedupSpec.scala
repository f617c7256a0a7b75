package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import scala.util.Random

/** Exact substring-span dedup ([[Dedup.duplicateSpans]]): planted duplicated
  * blocks must surface as exactly the maximal spans covering them, and the
  * operator must agree with a from-scratch brute-force reimplementation on a
  * random corpus.
  */
class SpanDedupSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val n = 8
  val rng = new Random(21)
  val vocab: IndexedSeq[String] = (0 until 500).map(i => s"w$i")

  def randomWords(k: Int): Seq[String] =
    Seq.fill(k)(vocab(rng.nextInt(vocab.length)))

  def ds(corpus: Seq[(Long, String)]) = {
    import spark.implicits._
    spark.createDataset(corpus)
  }

  /** From-scratch oracle: global gram counts -> duplicated positions ->
    * consecutive runs merged into (start, end, nGrams) per doc. */
  def bruteSpans(corpus: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
    val grams = corpus.flatMap { case (id, text) =>
      val w = text.trim.split(" ")
      if (w.length < n) Seq.empty
      else (0 to w.length - n).map(i => (id, i + 1L, w.slice(i, i + n).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).map { case (g, occ) => (g, occ.size) }
    val dup = grams.filter { case (_, _, g) => counts(g) > 1 }
    dup.groupBy(_._1).flatMap { case (id, occ) =>
      val ps = occ.map(_._2).sorted
      // merge positions whose covered ranges overlap or abut (gap <= n)
      val runs = ps.foldLeft(List.empty[List[Long]]) {
        case (run :: rest, p) if p - run.head <= n => (p :: run) :: rest
        case (acc, p) => List(p) :: acc
      }
      runs.map(r => (id, r.last, r.head + (n - 1), r.size.toLong))
    }.toSet
  }

  def run(corpus: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] =
    Dedup.duplicateSpans(ds(corpus), n).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
      .toSet

  test("planted cross-document block becomes one maximal span per document") {
    val block = randomWords(20)
    val a = randomWords(30) ++ block ++ randomWords(25) // block at words 31..50
    val b = randomWords(10) ++ block ++ randomWords(40) // block at words 11..30
    val corpus = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")),
      (3L, randomWords(60).mkString(" ")))
    // 20-word block -> 13 duplicated 8-gram starts; span covers the block
    assert(run(corpus) === Set(
      (1L, 31L, 50L, 13L),
      (2L, 11L, 30L, 13L)))
  }

  test("a block repeated within one document yields two separated spans") {
    val block = randomWords(12)
    val doc = randomWords(15) ++ block ++ randomWords(20) ++ block ++ randomWords(9)
    val corpus = Seq((7L, doc.mkString(" ")), (8L, randomWords(50).mkString(" ")))
    // starts 16..20 (5 grams) and 48..52: separated by 20 unique words
    assert(run(corpus) === Set(
      (7L, 16L, 27L, 5L),
      (7L, 48L, 59L, 5L)))
  }

  test("documents shorter than the gram width and unique corpora yield nothing") {
    val corpus = Seq(
      (1L, randomWords(n - 1).mkString(" ")), // too short for any gram
      (2L, randomWords(40).mkString(" ")),
      (3L, randomWords(40).mkString(" ")))
    assert(run(corpus) === Set.empty)
  }

  /** Keep-first strip oracle: foreign = every dup-gram occurrence except the
    * (doc, pos)-smallest; islands -> per-doc (n_words, removed, kept, spans). */
  def bruteStrip(corpus: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
    val grams = corpus.flatMap { case (id, text) =>
      val w = text.trim.split(" ")
      if (w.length < n) Seq.empty
      else (0 to w.length - n).map(i => (id, i + 1L, w.slice(i, i + n).mkString(" ")))
    }
    val byGram = grams.groupBy(_._3)
    val foreign = byGram.values.filter(_.size > 1).flatMap { occ =>
      occ.sortBy(o => (o._1, o._2)).tail
    }
    val removedByDoc = foreign.groupBy(_._1).map { case (id, occ) =>
      val ps = occ.map(_._2).toSeq.sorted
      val runs = ps.foldLeft(List.empty[List[Long]]) {
        case (run :: rest, p) if p - run.head <= n => (p :: run) :: rest
        case (acc, p) => List(p) :: acc
      }
      val rem = runs.map(r => r.head + (n - 1) - r.last + 1).sum
      (id, (rem, runs.size.toLong))
    }
    corpus.map { case (id, text) =>
      val nWords = text.trim.split(" ", -1).length.toLong
      val (rem, spans) = removedByDoc.getOrElse(id, (0L, 0L))
      (id, nWords, rem, nWords - rem, spans)
    }.toSet
  }

  test("keep-first strip agrees with its oracle; keeper copy survives") {
    val block = randomWords(20)
    val a = randomWords(30) ++ block ++ randomWords(25)
    val b = randomWords(10) ++ block ++ randomWords(40)
    val corpus = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")),
      (3L, randomWords(60).mkString(" ")),
      (4L, Seq.fill(30)("spam").mkString(" "))) // within-doc flood
    val got = Dedup.stripSpanStats(ds(corpus), n).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
        r.getAs[Number](4).longValue))
      .toSet
    assert(got === bruteStrip(corpus))
    // doc 1 holds the first occurrence: nothing removed there; doc 2 loses
    // exactly the 20-word block; the flood doc keeps one gram's width start
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._3 == 0L)
    assert(byId(2L)._3 == 20L && byId(2L)._4 == 50L)
    assert(byId(3L)._3 == 0L)
    // foreign starts 2..23 cover words 2..30: 29 removed, 1 kept
    assert(byId(4L)._3 == 29L && byId(4L)._4 == 1L)
  }

  test("stripSpans rewrites exactly the foreign words; keepers byte-identical") {
    val block = randomWords(20)
    val a = randomWords(30) ++ block ++ randomWords(25)
    val b0 = randomWords(10)
    val b1 = randomWords(40)
    val corpus = Seq(
      (1L, a.mkString(" ")),
      (2L, (b0 ++ block ++ b1).mkString(" ")),
      (3L, randomWords(60).mkString(" ")),
      (4L, Seq.fill(30)("spam").mkString(" ")))
    val cleaned = Dedup.stripSpans(ds(corpus), n).collect().toMap
    assert(cleaned(1L) == corpus(0)._2) // keeper untouched
    assert(cleaned(2L) == (b0 ++ b1).mkString(" ")) // block excised
    assert(cleaned(3L) == corpus(2)._2)
    assert(cleaned(4L) == "spam") // flood keeps its first word only
  }

  test("overlapping covered ranges merge into one span (no double-count)") {
    // doc 3 duplicates doc 1's 8-gram at start 1 and doc 2's at start 3 but
    // start 2 is unique: the two covered ranges [1,8] and [3,10] overlap on
    // words 3..8 and MUST merge — separate islands would overlap-double-count
    // (n_removed 16 of 10 words, negative n_kept)
    val c = randomWords(10)
    val corpus = Seq(
      (1L, c.slice(0, 8).mkString(" ")),
      (2L, c.slice(2, 10).mkString(" ")),
      (3L, c.mkString(" ")))
    assert(run(corpus) === Set(
      (1L, 1L, 8L, 1L), (2L, 1L, 8L, 1L), (3L, 1L, 10L, 2L)))
    val strip = Dedup.stripSpanStats(ds(corpus), n).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
        r.getAs[Number](4).longValue)).toSet
    assert(strip === Set(
      (1L, 8L, 0L, 8L, 0L), (2L, 8L, 0L, 8L, 0L), (3L, 10L, 10L, 0L, 1L)))
  }

  test("duplicateSpans plan: join-free single gram pass, exactly two " +
    "shuffles (gram window + per-doc window)") {
    import spark.implicits._
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val corpus = (0L until 100L).map { i =>
      val unique = (0 until 20).map(j => s"u${i}_$j").mkString(" ")
      if (i % 2 == 0) (i, s"$unique $boiler") else (i, unique)
    }
    val df = Dedup.duplicateSpans(ds(corpus), n)
    df.collect() // finalize AQE so the executed plan is the real one
    // the adaptive plan string carries BOTH the final and the initial
    // plan — assert on the final section only
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // r22: the dup-digest set no longer joins back at all — the count
    // rides a window over the gram-hash partitioning, so the gram-digest
    // explode runs ONCE and no join (broadcast or otherwise) may appear
    assert(!executed.contains("Join"),
      s"dup-position filter regressed to a join:\n$executed")
    assert("gramdigests".r.findAllMatchIn(executed).length == 1,
      s"gram-digest explode must run exactly once:\n$executed")
    // shuffle budget: one exchange on the gram hash for the dup-count
    // window, one to co-locate positions per document for the island
    // window — a third exchange is a plan regression
    val shuffles = "Exchange hashpartitioning".r
      .findAllMatchIn(executed).length
    assert(shuffles <= 2, s"expected <= 2 shuffle exchanges, saw $shuffles:\n$executed")
  }

  test("operator agrees with the brute-force oracle on a random dirty corpus") {
    // unique docs + shared prefixes + a boilerplate block injected into many
    val boiler = randomWords(15)
    val prefix = randomWords(10)
    val corpus: Seq[(Long, String)] = (0L until 40L).map { i =>
      val words =
        (if (i % 5 == 0) prefix else randomWords(10)) ++
          randomWords(20) ++
          (if (i % 3 == 0) boiler else randomWords(15)) ++
          randomWords(rng.nextInt(20))
      (i, words.mkString(" "))
    }
    val expected = bruteSpans(corpus)
    assert(expected.nonEmpty, "fixture must contain duplicated spans")
    assert(run(corpus) === expected)

    // cross-operator invariant: the rewritten corpus must carry exactly the
    // word counts the stats operator reports, document by document
    val kept = Dedup.stripSpanStats(ds(corpus), n).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](3).longValue)
      .toMap
    val cleaned = Dedup.stripSpans(ds(corpus), n).collect().toMap
    assert(cleaned.keySet == kept.keySet)
    for ((id, text) <- cleaned) {
      // same tokenization as the stats operator: trimmed single-space split
      val t = text.trim
      val words = if (t.isEmpty) 0L else t.split(" ", -1).length.toLong
      assert(words == kept(id),
        s"doc $id: cleaned has $words words, stats claim n_kept=${kept(id)}")
    }
  }
}
