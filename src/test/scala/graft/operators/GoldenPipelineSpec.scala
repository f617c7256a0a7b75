package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper

/** Pinned goldens for t09 (language-ID argmax counts) and t10 (winnowing
  * fingerprint counts) at sf0.01 — both now ALSO DuckDB-oracled in the
  * driver gate; these goldens stay as cross-implementation
  * defense-in-depth. The golden files were derived by an INDEPENDENT Python
  * reimplementation of the kernels (tools/golden_t09_t10.py — FNV-1a +
  * splitmix64, winnowing <=-rightmost window rule, script-first langid),
  * so these are cross-implementation checks, not self-snapshots. */
class GoldenPipelineSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val sfDir = "/root/testdata/sf0.01"

  private def golden(name: String): Seq[(String, String)] = {
    val url = getClass.getResource(s"/golden/$name")
    assert(url != null, s"missing golden resource $name")
    val src = scala.io.Source.fromURL(url)
    try src.getLines().map { l =>
      val Array(a, b) = l.split("\t"); (a, b)
    }.toVector
    finally src.close()
  }

  test("t09 langid counts match the independent golden at sf0.01") {
    assume(new java.io.File(sfDir).isDirectory)
    val got = SparkEntrySpecAccess.run("t09_langid", spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1).toString)).toVector
    assert(got == golden("t09_langid_sf001.tsv"))
  }

  test("t10 fingerprint counts match the independent golden at sf0.01") {
    assume(new java.io.File(sfDir).isDirectory)
    val got = SparkEntrySpecAccess.run("t10_fingerprints", spark, sfDir)
      .collect().map(r => (r.getLong(0).toString, r.getInt(1).toString)).toVector
    assert(got == golden("t10_fingerprints_sf001.tsv"))
  }

  test("g01 supermer spans match the independent kernel golden at sf0.01") {
    // golden derived by tools/golden_g01.py: a from-scratch Python
    // reimplementation of the md5 DNA derivation, canonical XOR priority,
    // spaced-seed mask and brute-force window minimum — cross-implementation
    // evidence for the core minimizer scanner on the driver's data
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/g01_spans_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0).toLong, f(1).toLong, f(2).toLong, f(3).toLong)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("g01_supermer_spans", spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == expected)
  }

  test("g02 LCA index counts match the independent build golden at sf0.01") {
    // golden from tools/golden_g02.py: the whole index build (taxonomy,
    // genome derivation, minimizer extraction, LCA fold, per-taxon counts)
    // re-implemented from scratch in Python
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g02_lca_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g02_lca_index", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
  }

  test("g03 classification counts match the independent resolver golden at sf0.01") {
    // golden from tools/golden_g03.py — scanner, index AND the Kraken 2
    // resolver (root-path scoring, LCA-folded ties) reimplemented from
    // scratch: the whole flagship chain is cross-implementation verified
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g03_classify_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g03_classify", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
  }

  test("g07 wide classification matches the independent two-word golden at sf0.01") {
    // golden from tools/golden_g07.py: the wide (m=40) kernel re-done with
    // Python big ints (canonicalization, per-word XOR, unsigned compare) —
    // the two-long packing and wide scanner are cross-verified end to end
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g07_wide_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g07_wide_classify", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
  }

  test("g05 bracken weights match the independent window golden at sf0.01") {
    // golden from tools/golden_g05.py: brute-force per-window classification
    // with the hit-group gate — cross-verifies the O(1) run-length window
    // slide, the last unpinned flagship kernel
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/g05_bracken_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0).toLong, f(1).toLong, f(2).toLong)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("g05_bracken", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == expected)
  }

  test("g04 2-step classification matches the independent pipeline golden") {
    // golden from tools/golden_g04_g06_g08.py: evidence counting, species
    // clade selection, sub-library rebuild and re-classification re-done
    // from scratch — the dynamic 2-step pipeline end to end
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g04_classify2_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g04_classify2", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
  }

  test("g06 respaced depth histogram matches the independent golden") {
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g06_stats_sf001.tsv")
      .map { case (d, n) => (d.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g06_index_stats", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
  }

  test("g08 multisample classification matches the independent golden") {
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/g08_multisample_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0), f(1).toLong, f(2).toLong)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("g08_multisample", spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == expected)
  }

  test("g09 frequency-ordered classification matches the independent golden") {
    // golden from tools/golden_g09.py: demotion-set derivation (per-position
    // canonical m-mer counts, count-desc/mer-asc top-N) and the demoted
    // UNSIGNED priority re-done from scratch. The index stores ~2.2k
    // DEMOTE-flagged keys at this topN, so a build/classify ordering desync
    // unclassifies hundreds of reads and fails this golden loudly.
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g09_freq_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g09_freq_classify", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
    // guard the golden's blind spot: reads are exact genome substrings, so
    // per-taxon COUNTS equal the undemoted g03's even when demotion works —
    // a regression that silently disables demotion on BOTH build and
    // classify sides would keep this golden green. Assert the demotion is
    // ACTIVE: the built index must store DEMOTE-flagged keys.
    locally {
      import spark.implicits._
      // the REAL star taxonomy: a dummy one would fail the build-time
      // taxon-validity filter and silently empty the index under test
      val bcTax = spark.sparkContext.broadcast(
        GenomicQueries.starTaxonomy(spark, sfDir))
      val lib = SparkEntrySpecAccess.customerLib(spark, sfDir)
      val base = new graft.index.MinimizerIndex(
        graft.index.IndexParams(k = 35, m = 31, spaces = 7, buckets = 32), bcTax)
      val demoted = graft.index.FrequencyOrdering.topCanonicalMers(
        base.packLibrary(lib), 31, fraction = 1.0, topN = 65536)
      assert(demoted.length == 65536, "demotion derivation returned a short set")
      val index = new graft.index.MinimizerIndex(graft.index.IndexParams(
        k = 35, m = 31, spaces = 7, buckets = 32,
        demoted = Some(demoted)), bcTax)
      val flagged = index.makeRecords(lib)
        .filter($"id1" < 0L).count() // DEMOTE = bit 63 -> negative keys
      assert(flagged > 1000L,
        s"expected thousands of demote-flagged index keys, got $flagged")
    }
  }

  test("g11 in-memory classification matches g03's independent golden") {
    // the zero-shuffle path must reproduce the join path's golden-pinned
    // output bit for bit — same golden file as g03
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g03_classify_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g11_mem_classify", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
  }

  test("g12 wide in-memory classification matches g07's independent golden") {
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g07_wide_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g12_mem_wide_classify", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
  }

  test("g13 m=64 frequency-demoted classification matches the independent golden") {
    // golden from tools/golden_g13.py: at full width the demote flag cannot
    // ride in the key, so the scanner's out-of-band comparison lane decides
    // window minima — modeled independently as (demoted?, priority) tuple
    // minima whose key is the priority alone. ~19k of 47k index keys come
    // from demoted mers here, so any divergence in the compare-time lane
    // (or a build/classify demotion desync) fails loudly.
    assume(new java.io.File(sfDir).isDirectory)
    val expected = golden("g13_wide64_freq_sf001.tsv")
      .map { case (t, n) => (t.toLong, n.toLong) }
    val got = SparkEntrySpecAccess.run("g13_wide64_freq_classify", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == expected)
    // guard the golden's blind spot (see g09): at m=64 the flag never
    // reaches the keys at all — demotion changes SELECTION. Assert the
    // demoted and undemoted index KEY SETS genuinely differ, so a
    // regression that disables demotion on both sides cannot stay green.
    locally {
      import spark.implicits._
      // the REAL star taxonomy: a dummy one would fail the build-time
      // taxon-validity filter and silently empty the index under test
      val bcTax = spark.sparkContext.broadcast(
        GenomicQueries.starTaxonomy(spark, sfDir))
      val lib = SparkEntrySpecAccess.customerLib(spark, sfDir)
      val packed = lib.map { case (t, dna) =>
        (t, graft.kmers.Dna.pack2bit(dna), dna.length) }
      val demoted = graft.index.FrequencyOrdering.topCanonicalWideMers(
        packed, 64, fraction = 1.0, topN = 65536)
      assert(demoted.length == 2 * 65536)
      def keys(dem: Array[Long]) =
        new graft.index.WideMinimizerIndex(k = 66, m = 64, bcTax, 0, dem)
          .makeRecords(lib).select($"id1", $"id2")
          .as[(Long, Long)].collect().toSet
      val withDem = keys(demoted)
      val without = keys(Array.emptyLongArray)
      val moved = (withDem diff without).size
      assert(moved > 1000,
        s"demotion must change thousands of selected keys, moved only $moved")
    }
  }

  test("g10 per-sample 2-step classification matches the independent golden") {
    // golden from tools/golden_g04_g06_g08.py: the g04 pipeline (evidence,
    // species selection, sub-library rebuild, re-classification) run
    // independently per sample in Python — the engine must reproduce it in
    // its one-pass grouped (leaf-pair re-fold) form
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/g10_multisample2_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0), f(1).toLong, f(2).toLong)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("g10_multisample_classify2", spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == expected)
  }

  test("t06 MinHash LSH pairs match the independent pipeline golden") {
    // golden from tools/golden_t06.py: shingling, signed-min MinHash,
    // banding and exact-Jaccard verification re-done from scratch — the
    // flagship dedup pipeline is cross-implementation verified
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/t06_minhash_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0).toLong, f(1).toLong, f(2).toDouble)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("t06_minhash_lsh", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toVector
    assert(got == expected)
  }

  test("m01 media features match the analytic pixel golden") {
    // golden from tools/golden_m01.py: the 8x8 pixel grid is fully
    // determined BEFORE the PNG round trip (java hashCode + mix64 chain),
    // so pure-Python analytic pixels + float32 grid pooling independently
    // verify the imageio encode -> sniff -> decode -> feature path
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/m01_media_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t")
      (f(0).toLong, f(1), f(2).toInt, f(3).toInt, f(4).toFloat, f(5).toFloat)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("m01_media_features", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getFloat(4), r.getFloat(5))).toVector
    assert(got == expected)
  }

  test("m02 audio features match the analytic PCM golden") {
    // golden from tools/golden_m02.py: the 800-sample PCM chain is fully
    // determined BEFORE the WAV round trip (java hashCode + mix64 chain,
    // int16 quantization is clamp(round(s*32767))/32768), so pure-Python
    // analytic envelopes independently verify the JDK WAV encode -> sniff
    // -> javax.sound decode -> RMS feature path
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/m02_audio_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t")
      (f(0).toLong, f(1), f(2).toDouble, f(3).toInt, f(4).toLong,
        f(5).toDouble, f(6).toFloat, f(7).toFloat)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("m02_audio_features", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3), r.getLong(4), r.getDouble(5), r.getFloat(6),
        r.getFloat(7))).toVector
    assert(got == expected)
  }

  test("m03 frame digests match the analytic byte golden") {
    // golden from tools/golden_m03.py: the blob is exact byte arithmetic
    // (java hashCode + mix64 chain), so hashlib md5 over the decimated
    // 256-byte frames independently verifies the frame-sampling dataflow
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/m03_frames_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0).toLong, f(1).toLong, f(2))
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("m03_frame_sample", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toVector
    assert(got == expected)
  }

  test("m04 video metadata matches the analytic box-layout golden") {
    // golden from tools/golden_m04.py: timescale/duration/dims/mdat length
    // are fully determined BEFORE the ISO-BMFF round trip (java hashCode +
    // mix64 chain) and the box sizes are fixed by the public spec
    // (n_bytes = 244 + mdat), so pure-Python field math independently
    // verifies the encodeMp4Header -> sniff -> box-walk parse path
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/m04_video_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t")
      (f(0).toLong, f(1), f(2).toLong, f(3), f(4).toLong, f(5).toDouble,
        f(6).toInt, f(7).toInt, f(8).toInt)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("m04_video_meta", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getDouble(5), r.getInt(6),
        r.getInt(7), r.getInt(8))).toVector
    assert(got == expected)
  }

  test("t08 SimHash pairs match the independent golden") {
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/t08_simhash_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0).toLong, f(1).toLong, f(2).toLong)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("t08_simhash", spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toVector
    assert(got == expected)
  }

  test("t13 dedup decisions match the independent union-find golden") {
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/t13_decisions_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0).toLong, f(1).toLong, f(2).toBoolean)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("t13_dedup_decisions", spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toVector
    assert(got == expected)
  }

  test("t15 source-similarity estimates match the independent sketch golden") {
    // golden from tools/golden_t15.py: per-source 128-hash MinHash sketches
    // and matching-position estimates re-done from scratch — pins the
    // native TypedImperativeAggregate and the distributed pairing
    assume(new java.io.File(sfDir).isDirectory)
    val url = getClass.getResource("/golden/t15_source_sim_sf001.tsv")
    assert(url != null)
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().map { l =>
      val f = l.split("\t"); (f(0), f(1), f(2).toDouble)
    }.toVector finally src.close()
    val got = SparkEntrySpecAccess.run("t15_source_similarity", spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toVector
    assert(got == expected)
  }
}

/** Indirection so the spec exercises exactly the registered harness query. */
private object SparkEntrySpecAccess {
  def run(name: String, spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  /** The harness queries' customer-genome library, for demotion-activity
    * guards that rebuild indexes outside the registered queries. */
  def customerLib(spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Int, String)] = {
    import spark.implicits._
    GenomicQueries.customerGenomes(spark, dir)
      .select($"taxon", $"dna").as[(Int, String)]
  }
}
