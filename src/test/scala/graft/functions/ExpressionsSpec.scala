package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import org.apache.spark.sql.functions._

class ExpressionsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))
    ).toDF("id", "a", "b")
  }

  test("cosine_sim and dot_product native expressions via SQL") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("v")
    val got = spark.sql(
      "SELECT id, round(cosine_sim(a, b), 6) AS c, dot_product(a, b) AS d FROM v")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((1.0, 1.0)))
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L)._2 == 32.0)
    val expected3 = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got(3L)._1 - BigDecimal(expected3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("native cosine is bitwise-equal to the HOF formulation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val data = Seq.fill(50)((Array.fill(64)(rng.nextGaussian().toFloat),
      Array.fill(64)(rng.nextGaussian().toFloat))).toDF("a", "b")
    val hofDot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val both = data.select(
      call_function("cosine_sim", $"a", $"b").as("native"),
      (hofDot($"a", $"b") / (sqrt(hofDot($"a", $"a")) * sqrt(hofDot($"b", $"b"))))
        .as("hof"))
      .collect()
    for (r <- both) assert(r.getDouble(0) == r.getDouble(1)) // exact, not approx
  }

  test("cosine_sim participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // a non-foldable source (range) so the projection isn't constant-folded
    val df = spark.range(100)
      .select(transform(sequence(lit(1), lit(8)),
        i => (i + $"id").cast("float")).as("a"))
      .select(call_function("cosine_sim", $"a", $"a").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen stages; the cosine projection
    // must be inside one (note: the HOF transform Project is NOT codegen'd —
    // exactly the gap the native expression closes)
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosinesimilarity.*"),
      s"cosine projection not codegen'd:\n$plan")
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("graft_minimizers SQL function agrees with the scanner kernel") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(43)
    val dna = Array.fill(300)("ACGT"(rng.nextInt(4))).mkString
    val got = Seq(dna).toDF("dna")
      .select(call_function("graft_minimizers", $"dna", lit(35), lit(31), lit(7))
        .as("mins"))
      .collect()(0).getSeq[Long](0)
    val scanner = new graft.kmers.SupermerScanner(35,
      graft.kmers.SpacedSeedPriority(7, graft.kmers.RandomXorPriority(31)))
    val expected = scanner.scan(dna).map(_.minimizer).toVector.distinct
    assert(got.toVector == expected)
  }

  test("dot_long equals the zip_with/aggregate fold on signed long vectors") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // LCG-generated signed vectors, incl. zero and single-element shapes
    var s = 42L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L
      (s >> 40) % 1000 }
    val rows = (0 until 50).map { i =>
      val d = 1 + (i % 7)
      (Array.fill(d)(nxt()), Array.fill(d)(nxt()))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(call_function("dot_long", $"a", $"b")).collect()
      .map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) =>
      a.zip(b).map(t => t._1 * t._2).sum }
    assert(got == want)
  }

  test("nfc_normalize composes decomposed sequences and agrees with " +
    "java.text.Normalizer on messy inputs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val decomposed = "Café au lait" // e + combining acute
    val composed = "Café au lait"
    val messy = Seq(decomposed, composed, "", "plain ascii",
      "Ǻngström", // multiple combining marks
      "ṩ already-nfd ṩ")
    val got = messy.toDF("t")
      .select(call_function("nfc_normalize", $"t").as("n"))
      .collect().map(_.getString(0))
    val want = messy.map(java.text.Normalizer.normalize(_,
      java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
    assert(got(0) == composed) // composition actually happened
    // null propagates, no NPE from the fast path
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(call_function("nfc_normalize", $"t")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("nfc_normalize participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = spark.range(10).selectExpr("CAST(id AS STRING) AS t")
      .select(call_function("nfc_normalize", col("t")))
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc)
    assert(df.collect().map(_.getString(0)).toSeq ==
      (0 until 10).map(_.toString))
  }

  test("gram_digests: position count, sequence identity, and agreement " +
    "with a naive per-gram chain") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x a b c y"),
      (4L, "a b"), (5L, "ab c d"), (6L, "a bc d"))
    val n = 3
    val got = rows.toDF("doc_id", "text")
      .select($"doc_id", split(trim($"text"), " ").as("w"))
      .filter(size($"w") >= n)
      .select($"doc_id", posexplode(call_function("gram_digests", $"w", lit(n))))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col.h1", $"col.h2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // naive reimplementation: token hashes via the same public kernels
    import graft.functions.TextAnalysis._
    def naive(text: String) = {
      val w = text.split(" ")
      val t1 = w.map(t => hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      val t2 = t1.map(h => mix64(h ^ GramTokenTweak))
      (0 to w.length - n).map(i => (i + 1,
        gramChain(t1, i, n, GramSeedA), gramChain(t2, i, n, GramSeedB)))
    }
    val want = rows.filter(_._2.split(" ").length >= n).flatMap { case (id, t) =>
      naive(t).map { case (p, a, b) => (id, p, a, b) }
    }
    assert(got.sorted.toSeq == want.sorted)
    // identical grams agree across documents; 4-gram of doc1 vs doc2
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).map(g => (g._3, g._4)).toSeq ==
      byDoc(2L).map(g => (g._3, g._4)).toSeq)
    // the shared "a b c" gram matches between doc 1 (pos 1) and doc 3 (pos 2)
    assert(byDoc(1L).find(_._2 == 1).map(g => (g._3, g._4)) ==
      byDoc(3L).find(_._2 == 2).map(g => (g._3, g._4)))
    // token-boundary identity: ["ab","c","d"] must NOT collide with
    // ["a","bc","d"] (sequences, not concatenations)
    assert(byDoc(5L).map(g => (g._3, g._4)).toSet
      .intersect(byDoc(6L).map(g => (g._3, g._4)).toSet).isEmpty)
    // short docs are filtered by the caller; n > tokens yields no rows
    assert(!byDoc.contains(4L))
    // KNOWN-ANSWER vector, derived by an independent Python
    // reimplementation of FNV-1a-over-bytes + splitmix64 + the chain fold
    // (not by these kernels) — pins the hash DEFINITION itself, so an
    // off-by-one in hashUtf8/gramChain cannot cancel against a naive
    // reimplementation built from the same kernels
    assert(byDoc(1L).find(_._2 == 1).map(g => (g._3, g._4)).get ==
      ((-4235485103605351373L, 3266950008819071677L)))
    // null array elements on the SQL surface hash to the sentinel — total
    // function, no NPE; null n yields NULL per SQL semantics
    val withNull = spark.sql(
      s"SELECT gram_digests(array('a', CAST(NULL AS STRING), 'b'), 2) AS g")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(withNull.length == 2)
    val nullN = spark.sql(
      "SELECT gram_digests(array('a','b'), CAST(NULL AS INT)) AS g")
      .collect()(0)
    assert(nullN.isNullAt(0), "null n must yield NULL, not seed digests")
    val bad = intercept[Exception] {
      spark.sql("SELECT gram_digests(array('a','b'), 0)").collect()
    }
    assert(bad.getMessage.contains("n must be >= 1") ||
      bad.getCause != null && bad.getCause.getMessage.contains("n must be >= 1"))
  }

  test("GraftExtensions registers functions at session build time") {
    val s2 = SparkSessionTestWrapper.session.newSession()
    // newSession shares extensions state; use withExtensions path instead:
    // verify the injected builder works through the extension object
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(e) // must not throw; function list is wired
    GraftFunctions.register(s2)
    import s2.implicits._
    val one = Seq((Array(1.0f), Array(1.0f))).toDF("a", "b")
      .select(call_function("cosine_sim", $"a", $"b")).collect()(0).getDouble(0)
    assert(one == 1.0)
  }
}
