package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import Q.t

/** Harness entries for the hash-kernel training-data operators (MinHash
  * LSH, SimHash, n-gram Jaccard, language-ID, fingerprinting, token
  * estimation, ANN). ALL carry full DuckDB oracles whose hash / hyperplane
  * / quantizer kernels are re-derived in SQL (see the fragment helpers
  * below) — since r11 that includes every ANN lane: v04/v05/v08 were
  * always deterministic, and v06 (IVF) / v07 (PQ) now train on the exact
  * integer Lloyd's ([[Clustering.kmeansSqlCtes]] / [[pqCtes]]) instead of
  * float k-means, so their candidate sets are SQL-reproducible too, and
  * v10 composes them into IVF-PQ over residuals ([[ivfPqCtes]]).
  * Planted-recall and recall-vs-brute-force gate specs remain in ScalaTest
  * as the ANN quality contract.
  */
object PipelineQueries {

  // ---- DuckDB SQL fragments reproducing the Scala hash kernels ----
  //
  // The dedup/minhash oracles (t08, t15) need TextAnalysis.hashString
  // (FNV-1a + mix64 avalanche) and the MinHash affine family inside plain
  // SQL. The corpus is ASCII, so FNV over UTF-16 code units equals FNV over
  // codepoints (DuckDB unicode()). All arithmetic runs in the unsigned
  // [0, 2^64) domain as HUGEINT with explicit wrap — DuckDB BIGINT ERRORS
  // on overflow instead of wrapping — and 64x64 multiplies split into
  // 32-bit halves so no intermediate exceeds the signed-128-bit HUGEINT
  // range. list_transform over a one-element list acts as a let-binding for
  // each intermediate, keeping expression size linear in the step count.

  /** 2^64 as a HUGEINT literal (the wrap modulus). */
  private val M64 = "18446744073709551616::HUGEINT"

  /** (u * c) mod 2^64 for u < 2^64 and a constant c < 2^64: split u into
    * 32-bit halves; only the low 32 bits of the high product survive. */
  private def mul64(u: String, c: String): String =
    s"((($u) % 4294967296) * $c::HUGEINT" +
      s" + (((($u) // 4294967296) * $c::HUGEINT) % 4294967296)" +
      s" * 4294967296::HUGEINT) % $M64"

  /** (a * b) mod 2^64 for two full-width operands (the MinHash pa*s). */
  private def mul64Full(a: String, b: String): String =
    s"((($a) % 4294967296) * (($b) % 4294967296)" +
      s" + (((($a) // 4294967296) * (($b) % 4294967296)" +
      s"     + (($a) % 4294967296) * (($b) // 4294967296)) % 4294967296)" +
      s"   * 4294967296::HUGEINT) % $M64"

  /** TextAnalysis.mix64 on an unsigned HUGEINT expression (>>> n becomes
    * // 2^n on the non-negative domain; xor is native on HUGEINT). */
  private def mix64Sql(z: String): String =
    s"""list_transform([(($z) + 11400714819323198485::HUGEINT) % $M64], z1 ->
       |  list_transform([xor(z1, z1 // 1073741824)], x1 ->
       |    list_transform([${mul64("x1", "13787848793156543929")}], z2 ->
       |      list_transform([xor(z2, z2 // 134217728)], x2 ->
       |        list_transform([${mul64("x2", "10723151780598845931")}], z3 ->
       |          xor(z3, z3 // 2147483648)
       |        )[1])[1])[1])[1])[1]""".stripMargin

  /** TextAnalysis.hashString's FNV-1a loop over the characters of column
    * `g` (list_reduce with the offset basis prepended as the seed). */
  private val fnvSql: String =
    "list_reduce(list_prepend(14695981039346656037::HUGEINT," +
      " list_transform(string_split(g, ''), c -> unicode(c)::HUGEINT))," +
      s" (acc, c) -> (xor(acc, c) * 1099511628211::HUGEINT) % $M64)"

  /** Unsigned HUGEINT in [0, 2^64) -> the same 64 bits as signed BIGINT
    * (Scala Long semantics, needed wherever the Scala side compares). */
  private def s64(u: String): String =
    s"CASE WHEN ($u) >= 9223372036854775808::HUGEINT" +
      s" THEN (($u) - $M64)::BIGINT ELSE ($u)::BIGINT END"

  /** Hyperplane-LSH re-derivation shared by the v04/v05 oracles, mirroring
    * [[Similarity.hyperplaneBucket]]: plane component (p, d) is
    * mix64((p << 32) | d) read as SIGNED long over 2^63 (Long.MaxValue
    * .toDouble rounds to exactly 2^63), the per-(vector, plane) dot is the
    * same left-to-right double accumulation as the Scala while-loop
    * (list_sum over the products — validated bitwise by the v02 oracle),
    * and the bucket is the sign-pattern sum (one bit per plane, so sum ==
    * bitwise-or). Yields CTEs comp/compv/vb with vb(id, vec, bucket).
    * `src`/`idCol`/`vecCol` select the vector source — the embeddings
    * table by default (v04/v05), or a derived CTE like t39's hashed
    * document embeddings. */
  private def hyperplaneCtes(planes: Int, src: String = "embeddings",
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val comp = s64(mix64Sql("(p * 4294967296 + d)::HUGEINT"))
    s"""comp AS (
       |  SELECT p, d, ($comp)::DOUBLE / 9223372036854775808::DOUBLE AS c
       |  FROM range($planes) pl(p), range(64) dm(d)
       |), compv AS (
       |  SELECT p, list(c ORDER BY d) AS cv FROM comp GROUP BY p
       |), vb AS (
       |  SELECT e.$idCol AS id, e.$vecCol AS vec,
       |    CAST(sum(CASE WHEN list_sum(list_transform(list_zip(e.$vecCol, cp.cv),
       |      z -> z[1]::DOUBLE * z[2])) > 0 THEN 1 << cp.p ELSE 0 END) AS INTEGER)
       |      AS bucket
       |  FROM $src e CROSS JOIN compv cp
       |  GROUP BY e.$idCol, e.$vecCol
       |)""".stripMargin
  }

  /** The t38/t39 hashed-embedding derivation ([[graft.functions
    * .TextAnalysis.hashedEmbedding]] re-derived in SQL): tokens -> signed
    * FNV+mix64 hash -> bucket `floorMod(h, dim)` with the hash-sign weight
    * -> per-bucket counts (`acc`) and the L2 norm (`nrm`).
    *
    * Tokenizer-parity caveat (same class as the streaming span path's):
    * Java's regex `\s` includes U+000B/U+001C-1F and `String.trim` strips
    * every char <= U+0020, while DuckDB's RE2 `\s` is `[\t\n\f\r ]` and
    * `trim()` strips spaces only — documents containing those exotic
    * control characters as the ONLY separator between tokens would
    * tokenize differently on the two sides. The testdata corpora contain
    * none (asserted by the sweep staying green); a corpus that does should
    * normalize control chars to ' ' before both derivations. */
  private def hashedEmbCtes(dim: Int): String =
    s"""toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS g
       |  FROM documents),
       |h AS (SELECT doc_id, ${s64(mix64Sql(fnvSql))} AS h FROM toks),
       |b AS (
       |  SELECT doc_id, ((h % $dim) + $dim) % $dim AS idx,
       |    CASE WHEN h < 0 THEN -1.0 ELSE 1.0 END AS s
       |  FROM h),
       |acc AS (SELECT doc_id, idx, sum(s) AS v FROM b GROUP BY 1, 2),
       |nrm AS (SELECT doc_id, sqrt(sum(v*v)) AS n FROM acc GROUP BY 1)"""
      .stripMargin

  /** Exact cosine over aliases a.vec / b.vec — the [[graft.functions
    * .VectorKernels.cosine]] formulation (dot / (sqrt(na)·sqrt(nb)), all
    * left-to-right double accumulation). */
  private val cosSql: String =
    """list_sum(list_transform(list_zip(a.vec, b.vec),
      |      z -> z[1]::DOUBLE * z[2]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(a.vec, x -> x::DOUBLE * x::DOUBLE))) *
      |     sqrt(list_sum(list_transform(b.vec, x -> x::DOUBLE * x::DOUBLE))))"""
      .stripMargin

  /** The multi-probe expansion over vb ([[Similarity.probeBuckets]]): the
    * exact bucket plus every single-bit flip. */
  private def probeList(planes: Int): String =
    s"unnest(list_prepend(bucket, list_transform(range(0, $planes), " +
      "p -> xor(bucket, (1 << p)::INTEGER))))"

  /** The v07 PQ oracle's training + encoding CTEs: per-subspace integer
    * Lloyd's over the milli-quantized sample (first `trainN` vec_ids),
    * re-deriving [[Similarity.trainPqCodebooks]] exactly — same init (the
    * first `cents` sample rows), same exact long distances with (dist, cid)
    * ties, same round-half-up centroid updates, same empty-cluster
    * coalesce. Yields, besides `qv` (all quantized vectors) and `samp`:
    * per-subspace codebooks `s{i}c{iters}(cid, m)`, base-side subvector
    * slices `b{i}(vec_id, v)`, and per-subspace encodings
    * `enc{i}(vec_id, cid)`. */
  private def pqCtes(subspaces: Int, cents: Int, iters: Int, dim: Int,
      trainN: Int): String = {
    val sub = dim / subspaces
    def slice(si: Int) = s"v[${si * sub + 1}:${(si + 1) * sub}]"
    // training + encoding delegate to the SHARED Lloyd's generators
    // (Clustering.lloydCtes / lloydAssignCte) — the same text the c01–c04
    // and v06 oracles embed, so the assignment and update kernels can
    // never silently diverge between the k-means and PQ lanes
    val perSub = (0 until subspaces).map { si =>
      s"""s${si}p AS (SELECT vec_id, ${slice(si)} AS v FROM samp),
         |${Clustering.lloydCtes(s"s$si", s"s${si}p", cents, iters, sub)},
         |b$si AS (SELECT vec_id, ${slice(si)} AS v FROM qv),
         |${Clustering.lloydAssignCte(s"enc$si", s"b$si", s"s${si}c$iters")}"""
        .stripMargin
    }.mkString(",\n")
    s"""qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(x::DOUBLE * ${Clustering.Quantum} + 0.5) AS BIGINT)) AS v
       |  FROM embeddings),
       |samp AS (SELECT vec_id, v FROM qv ORDER BY vec_id LIMIT $trainN),
       |$perSub""".stripMargin
  }

  /** The v10 IVF-PQ oracle's training + encoding CTEs, re-deriving
    * [[Similarity.ivfPqKnn]]'s exact-integer pipeline: coarse centroids =
    * the shared Lloyd's over the quantized sample (prefix "g", one
    * "subspace" spanning all dims), `casg` = every vector's coarse cell,
    * `res` = per-vector RESIDUAL from its cell centroid, `sres` = the
    * sample's residuals (codebook training set), then per subspace the
    * same Lloyd's over residual slices and `enc{i}` residual encodings.
    * Every CTE is longs; the one float division happens in the consumer.
    *
    * The shared hubs (qv, samp, casg, res, sres, and the final codebooks
    * re-exported as `gcb` / `s{i}cb`) are AS MATERIALIZED: DuckDB 1.0
    * inlines CTEs per reference, and this graph references the residual
    * chain 16+ times — unmaterialized, each reference re-evaluates the
    * full coarse-training + assignment pipeline and the oracle blows up
    * combinatorially (measured: >10 min vs ~seconds). Consumers must
    * reference gcb / s{i}cb, never gc{iters} / s{i}c{iters} directly. */
  private def ivfPqCtes(nCells: Int, subspaces: Int, cents: Int, iters: Int,
      dim: Int, trainN: Int): String = {
    val sub = dim / subspaces
    def slice(si: Int) = s"v[${si * sub + 1}:${(si + 1) * sub}]"
    val perSub = (0 until subspaces).map { si =>
      s"""s${si}p AS MATERIALIZED (SELECT vec_id, ${slice(si)} AS v FROM sres),
         |${Clustering.lloydCtes(s"s$si", s"s${si}p", cents, iters, sub)},
         |s${si}cb AS MATERIALIZED (SELECT cid, m FROM s${si}c$iters),
         |b$si AS (SELECT vec_id, ${slice(si)} AS v FROM res),
         |${Clustering.lloydAssignCte(s"enc$si", s"b$si", s"s${si}cb",
             materialized = true)}"""
        .stripMargin
    }.mkString(",\n")
    s"""qv AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(x::DOUBLE * ${Clustering.Quantum} + 0.5) AS BIGINT)) AS v
       |  FROM embeddings),
       |samp AS MATERIALIZED (SELECT vec_id, v FROM qv ORDER BY vec_id LIMIT $trainN),
       |${Clustering.lloydCtes("g", "samp", nCells, iters, dim)},
       |gcb AS MATERIALIZED (SELECT cid, m FROM gc$iters),
       |${Clustering.lloydAssignCte("casg", "qv", "gcb", materialized = true)},
       |res AS MATERIALIZED (
       |  SELECT a.vec_id, a.cid,
       |    list_transform(list_zip(a.v, c.m), z -> z[1]-z[2]) AS v
       |  FROM casg a JOIN gcb c USING (cid)),
       |sres AS MATERIALIZED (
       |  SELECT r.vec_id, r.v FROM res r JOIN samp s USING (vec_id)),
       |$perSub""".stripMargin
  }

  /** Shared shingle derivation mirroring TextAnalysis.shingles(text, 3):
    * whitespace tokens (empties dropped), 3-gram join by single space, and
    * the under-3-token fallback to one whole-text shingle. `key` names the
    * grouping column carried through (doc_id / source). */
  private def shingleCtes(key: String): String =
    s"""toks AS (
       |  SELECT $key, list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |    t -> t <> '') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT $key, unnest(CASE WHEN len(w) = 0 THEN []
       |      WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
       |      ELSE list_transform(range(1, len(w) - 1),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
       |  FROM toks
       |)""".stripMargin

  /** The stopword-vote language-ID re-derived in SQL, through the `lab` CTE
    * (doc_id, lang_detected). The VALUES list renders from the live
    * [[TextAnalysis.stopwords]] map (quotes SQL-escaped, so elision
    * stopwords like "l'" cannot break the generated SQL). Shared by the
    * t09 distribution and t26 confusion-matrix oracles. */
  private val langIdCtes: String = {
    val values = TextAnalysis.stopwords.toSeq.sortBy(_._1)
      .flatMap { case (lang, ws) =>
        ws.toSeq.sorted.map(w => s"('$lang', '${w.replace("'", "''")}')")
      }
      .mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')) AS w
       |  FROM documents
       |), sw(lang, w) AS (
       |  SELECT * FROM (VALUES $values)
       |), scores AS (
       |  SELECT t.doc_id, s.lang, count(*) AS score
       |  FROM toks t JOIN sw s ON s.w = t.w
       |  GROUP BY 1, 2
       |), best AS (
       |  SELECT doc_id, lang, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rk
       |  FROM scores
       |), lab AS (
       |  SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_detected
       |  FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rk = 1
       |)""".stripMargin
  }

  // NO scan fan-out here (r21 A/B, LaneProfile): these loaders feed lanes
  // whose per-row kernels are cheap relative to the 32-task stage overhead
  // the extra exchange costs on the local single-row-group inputs —
  // measured fanout-off/on wall ratios t06 0.89, v04 0.65, v07 0.64,
  // v10 0.38. The genomic scans (GenomicQueries.ordersScan/customerGenomes)
  // keep the fan-out, where it measures 1.25-1.9x the other way.
  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "documents").select($"doc_id", $"text").as[(Long, String)]
  }

  private def vecs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "embeddings").select($"vec_id", $"embedding").as[(Long, Array[Float])]
  }

  /** Brute-force 3-gram Jaccard pairs at threshold 0.5 — the oracle for
    * t07 (inverted-index Jaccard, exact by construction at every scale)
    * AND for t06 (MinHash-LSH + exact verification). t06's verified pair
    * VALUES are exact Jaccard by construction (precision is exact at every
    * scale), but banded candidate RECALL is probabilistic at the threshold
    * boundary: P(candidate | s) = 1-(1-s^4)^16, i.e. 0.644 at s=0.5,
    * 0.988 at s=0.7, 0.9998 by s=0.8. Measured: full recall at <= sf0.1
    * (exact equality
    * holds — the driver's sf0.01 gate and the sf0.1 oracle both compare
    * exactly); at sf1.0, 17 of 51 exactly-0.5 pairs miss (rate 0.333 vs
    * the 0.356 theory) and every s > 0.5 pair is found. The sf1.0 gate
    * (tools/check_oracle.py LSH_RECALL) therefore checks t06 as
    * subset-exact + boundary-confined misses + recall floor — the honest
    * contract for an LSH operator — instead of papering over the math
    * with more bands. */
  private val bruteJaccardSql: String =
    """WITH words AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |), grams AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |  FROM words
      |), sizes AS (
      |  SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1
      |), pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
      | round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 4) AS jaccard
      |FROM pairs JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("t06_minhash_lsh", (s, dir) => {
      import s.implicits._
      // lane-local fan-out (r22): the r21 A/B removed it from the SHARED
      // docs() loader (a wash at sf0.1), but the sf1 scaling lens showed
      // t06's signature kernel serial (8-vs-32-core ratio 1.08) — the
      // shingle+minhash flatMap is the heavy pre-exchange kernel here, so
      // this lane fans its own scan; the other docs() lanes keep the
      // measured r21 choice
      Dedup.minhashDedup(
        Q.fanOut(t(s, dir, "documents"), $"doc_id")
          .select($"doc_id", $"text").as[(Long, String)],
        shingleN = 3, numHashes = 64,
        bands = 16, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }, Some(bruteJaccardSql), bench = true,
      // 16x4 candidateProb: 0.644 at s=0.5 (the boundary), 0.965 at 0.65,
      // 0.9997 at 0.8 — misses are probabilistically expected all the way
      // to ~0.8 (r19 ADVICE: the old 0.65 ceiling could flake on a corpus
      // with pairs in the 0.65-0.8 band; ~3.5%/pair at 0.66). The recall
      // floor still catches a broken pipeline (measured sf1.0 recall with
      // a CORRECT pipeline: 0.9935).
      lshRecall = Some(LshRecallPolicy(Seq("id_a", "id_b"), "jaccard",
        missCeiling = 0.8, recallFloor = 0.98))),

    Q("t07_ngram_jaccard", (s, dir) => {
      import s.implicits._
      Dedup.ngramJaccardPairs(docs(s, dir), shingleN = 3, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }, Some(bruteJaccardSql)),

    // ---- the recall-PLANNED variant of t06 (r18): banding chosen by
    // Dedup.lshPlan(threshold = 0.5, targetRecall = 0.99, maxHashes = 256)
    // -> 35 bands x 3 rows (105 hashes), candidateProb(0.5) = 0.9907 vs
    // the 16x4 default's 0.644 — the boundary pairs the sf1.0 gate showed
    // t06 missing are recovered by design, not luck. Same brute-force
    // oracle; t40's sf1.0 check carries the same LSH_RECALL boundary
    // contract in check_oracle (recall floor 0.99 — the plan's own
    // guarantee). ----
    Q("t40_minhash_planned", (s, dir) => {
      import s.implicits._
      Dedup.minhashDedupPlanned(docs(s, dir), shingleN = 3, threshold = 0.5,
        targetRecall = 0.99, maxHashes = 256)
        .orderBy($"id_a", $"id_b")
    }, Some(bruteJaccardSql),
      // 35x3 candidateProb: 0.9907 at s=0.5, 0.9976 at 0.55, 0.9998 at 0.6
      // — the planner's own guarantee is the floor; a miss at >= 0.6 would
      // contradict the much steeper 3-row curve
      lshRecall = Some(LshRecallPolicy(Seq("id_a", "id_b"), "jaccard",
        missCeiling = 0.6, recallFloor = 0.99))),

    // Oracle: the FULL simhash computation in SQL (shingles -> hashString
    // -> per-bit votes -> 64-bit signature -> pairwise popcount), brute
    // force over all pairs. EXACT by the pigeonhole principle, not just
    // empirically: any pair within Hamming distance 6 shares one of the 7
    // chunks verbatim, so the banded candidate generation cannot miss —
    // the Spark output IS the brute-force set.
    Q("t08_simhash", (s, dir) => {
      import s.implicits._
      Dedup.simhashDedup(docs(s, dir), shingleN = 3, maxDist = 6)
        .orderBy($"id_a", $"id_b")
    }, Some(
      s"""WITH ${shingleCtes("doc_id")}, hashes AS (
         |  SELECT DISTINCT doc_id, ${mix64Sql(fnvSql)} AS h FROM sh
         |), votes AS (
         |  SELECT doc_id, b,
         |    sum(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM hashes, range(64) r(b) GROUP BY doc_id, b
         |), sigs AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN v > 0 THEN 1::HUGEINT << b ELSE 0::HUGEINT END) AS sig
         |  FROM votes GROUP BY doc_id
         |)
         |SELECT CAST(a.doc_id AS BIGINT) AS id_a,
         | CAST(b.doc_id AS BIGINT) AS id_b,
         | CAST(bit_count(CAST(xor(a.sig, b.sig) AS BIT)) AS INTEGER) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(CAST(xor(a.sig, b.sig) AS BIT)) <= 6
         |ORDER BY id_a, id_b""".stripMargin)),

    // Oracle: the corpus is ASCII (no non-Latin codepoints — same premise
    // the t08/t15 hash oracles rest on), so detectLanguage's script-dominance
    // path never fires and the semantics reduce to the stopword-occurrence
    // vote with the strict-> lexicographic tie-break. The VALUES list is
    // generated from the live TextAnalysis.stopwords map, so the oracle
    // cannot drift from the Scala profiles.
    Q("t09_langid", (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .map { case (id, text) => (id, TextAnalysis.detectLanguage(text)) }
        .toDF("doc_id", "lang_detected")
        .groupBy($"lang_detected").agg(count(lit(1)).as("cnt"))
        .orderBy($"lang_detected")
    }, Some(
      s"""$langIdCtes
         |SELECT lang_detected, CAST(count(*) AS BIGINT) AS cnt
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin)),

    // detected-vs-labeled language confusion matrix: the label-audit pass a
    // curation pipeline runs before trusting upstream metadata (same
    // detection kernel and SQL CTEs as t09)
    Q("t26_lang_confusion", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang", $"text").as[(String, String)]
        .map { case (label, text) =>
          (label, TextAnalysis.detectLanguage(text))
        }
        .toDF("lang_label", "lang_detected")
        .groupBy($"lang_label", $"lang_detected")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy($"lang_label", $"lang_detected")
    }, Some(
      s"""$langIdCtes
         |SELECT d.lang AS lang_label, l.lang_detected,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM lab l JOIN documents d ON d.doc_id = l.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Oracle: the FULL winnowing kernel in SQL. The rightmost-tie rule picks
    // which POSITION a window selects, but every argmin position carries the
    // same hash VALUE — and the query counts distinct VALUES — so the
    // fingerprint set is exactly { min hash of each window }: two window
    // functions (frame min + frame size), no position bookkeeping. Valid
    // window starts are the full frames (cw = 4), plus j = 0 for the single
    // clipped window of docs with fewer k-grams than the window width;
    // sub-k-gram docs hash whole-text (1 fingerprint), empty docs get 0.
    Q("t10_fingerprints", (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .map { case (id, text) =>
          (id, TextAnalysis.winnowingFingerprints(text).length)
        }
        .toDF("doc_id", "n_fingerprints")
        .orderBy($"doc_id")
    }, Some(
      s"""WITH docs0 AS (
         |  SELECT doc_id, text, length(text) AS L FROM documents
         |), grams AS (
         |  SELECT doc_id, j, substr(text, j + 1, 8) AS g
         |  FROM docs0, unnest(range(0, greatest(L - 7, 0))) AS t(j)
         |), hashes AS (
         |  SELECT doc_id, j, ${mix64Sql(fnvSql)} AS h FROM grams
         |), wins AS (
         |  SELECT doc_id, j,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY j
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
         |    count(*) OVER (PARTITION BY doc_id ORDER BY j
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cw
         |  FROM hashes
         |), sel AS (
         |  SELECT doc_id, count(DISTINCT mh) AS nf
         |  FROM wins WHERE cw = 4 OR j = 0
         |  GROUP BY 1
         |)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  CAST(CASE WHEN d.L = 0 THEN 0 WHEN d.L < 8 THEN 1
         |    ELSE s.nf END AS BIGINT) AS n_fingerprints
         |FROM docs0 d LEFT JOIN sel s ON s.doc_id = d.doc_id
         |ORDER BY doc_id""".stripMargin)),

    Q("t11_token_estimate", (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .map { case (id, text) => (id, TextAnalysis.tokenEstimate(text)) }
        .toDF("doc_id", "n_tokens_est")
        .orderBy($"doc_id")
    }, Some(
      // mirrors TextAnalysis.tokenEstimate: regex token split, letter runs
      // cost 1 + (len-1)/5 subword tokens (NB: DuckDB `~` is a FULL match —
      // prefix tests need regexp_matches)
      """SELECT doc_id, CAST(COALESCE(list_sum(list_transform(
        |  regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
        |  t -> CASE WHEN regexp_matches(t, '^[A-Za-z]')
        |    THEN 1 + (length(t)-1)//5 ELSE 1 END)), 0) AS BIGINT) AS n_tokens_est
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("t12_quality_metrics", (s, dir) => {
      import s.implicits._
      TextAnalysis.withQuality(t(s, dir, "documents"), "text")
        .select($"doc_id".cast("long").as("doc_id"), $"n_tokens",
          round($"avg_word_len", 4).as("avg_word_len"),
          round($"alpha_ratio", 4).as("alpha_ratio"),
          round($"punct_ratio", 4).as("punct_ratio"))
        .orderBy($"doc_id")
    }, Some(
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | CAST(CASE WHEN trim(text) = '' THEN 0
        |   ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        | round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE) /
        |   greatest(CASE WHEN trim(text) = '' THEN 0
        |     ELSE length(regexp_split_to_array(trim(text), '\s+')) END, 1), 4) AS avg_word_len,
        | round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
        |   greatest(CAST(length(text) AS DOUBLE), 1.0), 4) AS alpha_ratio,
        | round(CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) /
        |   greatest(CAST(length(text) AS DOUBLE), 1.0), 4) AS punct_ratio
        |FROM documents ORDER BY 1""".stripMargin)),

    // Oracle: the verified pair set is the brute-force Jaccard >= 0.5 set
    // (same argument as t06), and connected components + min-id-keeps is
    // re-derived independently via a recursive transitive closure — dup
    // clusters are tiny, so the closure is cheap at gate scale.
    Q("t13_dedup_decisions", (s, dir) => {
      import s.implicits._
      Dedup.dedupDecisions(docs(s, dir), threshold = 0.5)
        .select($"id".cast("long").as("id"), $"cluster".cast("long").as("cluster"),
          $"keep")
        .orderBy($"id")
    }, Some(
      """WITH RECURSIVE words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM words
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1
        |), cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b FROM cand JOIN sizes sa ON sa.doc_id = id_a
        |    JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), walk AS (
        |  SELECT src AS id, src AS reach FROM edges
        |  UNION
        |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
        |)
        |SELECT CAST(id AS BIGINT) AS id, CAST(min(reach) AS BIGINT) AS cluster,
        |  min(reach) = id AS keep
        |FROM walk GROUP BY id ORDER BY id""".stripMargin)),

    // The DISTRIBUTED connected-components loop at a tracked operating
    // point (r10 verdict ask: the 2^22 driver auto-select absorbs every
    // oracle-scale duplicate graph, so the contraction loop had no green
    // oracle row or wall-time of its own). The graph: parts chained by
    // consecutive rank within p_brand — 25 parallel paths whose DIAMETER
    // grows with SF (~n/25; ~80 at sf0.01, ~800 at sf0.1), exactly the
    // shape that one-hop label propagation cannot finish in bounded rounds
    // and contraction + cumulative pointer doubling converges on in
    // O(log diameter). localMaxEdges = 0 forces the distributed loop (the
    // stderr probe in connectedComponents records the path taken), and the
    // default strict mode THROWS if the loop exits un-converged, so a
    // green row here is proof the contraction loop itself resolved every
    // chain. Oracle: a path's component is its brand, cluster = min
    // partkey per brand — no recursion needed.
    Q("t37_cc_contraction", (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"p_brand").orderBy($"p_partkey")
      val edges = t(s, dir, "part").select($"p_brand", $"p_partkey")
        .withColumn("prev", lag($"p_partkey", 1).over(w))
        .filter($"prev".isNotNull)
        .select($"prev".as("id_a"), $"p_partkey".as("id_b"))
      // the distributed loop pins its cumulative map in the passed scope;
      // the harness has no post-materialization hook, so snapshot the
      // labels eagerly (localCheckpoint blocks are ContextCleaner-reclaimed
      // once the frame is GC'd, unlike persisted plans) and release the
      // loop caches before returning — repeated bench reps then cannot
      // accumulate pinned blocks
      val scope = new Dedup.CacheScope
      val labels =
        try Dedup.connectedComponents(edges, localMaxEdges = 0L, scope = scope)
          .select($"id".cast("long").as("id"),
            $"cluster".cast("long").as("cluster"))
          .localCheckpoint()
        finally scope.release()
      labels.orderBy($"id")
    }, Some(
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  CAST(min(p_partkey) OVER (PARTITION BY p_brand) AS BIGINT)
        |    AS cluster
        |FROM part
        |QUALIFY count(*) OVER (PARTITION BY p_brand) > 1
        |ORDER BY 1""".stripMargin), bench = true),

    // IVF ANN, FULLY oracled (r10 verdict ask): the coarse quantizer is the
    // deterministic integer k-means (Clustering's exact Lloyd's — the c01
    // CTEs re-derive the identical centroids), the probe list is exact long
    // distances with (dist, cid) ties, and the in-cell scoring is the
    // already-proven exact float cosine. Recall gates stay in DedupSpec.
    // queryBound = 7 < Q = 20: the oracle covers the SHARDED query path
    // (three hash shards, training shared) — the r11 verdict ask.
    Q("v06_ivf_knn", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.ivfKnn(v.filter(_._1 < 20), v, k = 3, nCells = 8, nProbe = 3,
          queryBound = 7)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, Some(
      s"""${Clustering.kmeansSqlCtes(8, 3, 64, trainN = Some(1 << 17))},
         |probes AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT p.vec_id, c.cid, row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY CAST(list_sum(list_transform(list_zip(p.v, c.m),
         |        z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
         |    FROM q p CROSS JOIN c3 c WHERE p.vec_id < 20)
         |  WHERE rn <= 3),
         |ev AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |cand AS (
         |  SELECT DISTINCT pr.qid, a.vec_id AS nid
         |  FROM probes pr JOIN asg a ON a.cid = pr.cid
         |  WHERE pr.qid <> a.vec_id),
         |scored AS (
         |  SELECT c.qid, c.nid, $cosSql AS sim
         |  FROM cand c JOIN ev a ON a.id = c.qid JOIN ev b ON b.id = c.nid)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
         |  round(sim, 6) AS sim
         |FROM (SELECT qid, nid, sim, row_number() OVER (
         |    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn FROM scored)
         |WHERE rn <= 3 ORDER BY qid, sim DESC, nid""".stripMargin)),

    // group-level MinHash sketches via the native aggregate: per-source
    // corpus signatures -> pairwise estimated Jaccard between sources.
    // Fully distributed: signatures posexplode to (idx, val) and sources
    // whose sketches agree at a position meet in an equi-join, so the
    // estimate (= fraction of matching positions) never touches the driver
    // and pairs with zero sketch overlap are never materialized — at 10^5+
    // sources a driver-side O(n^2) loop would be the job's bottleneck.
    // feature-hashed document embeddings (hashing trick): token ->
    // FNV+mix64 -> signed bucket count -> L2 normalize — the model-free
    // text->vector bridge; its output feeds cosineDedup / ANN directly.
    // Dense (doc_id, idx, val) triples so the compare is exact per cell;
    // the oracle re-derives the hash, the signed buckets and the IEEE
    // normalization in SQL
    Q("t38_hashed_embedding", (s, dir) => {
      import s.implicits._
      val dim = 64
      t(s, dir, "documents").select($"doc_id", $"text").as[(Long, String)]
        .flatMap { case (id, text) =>
          val v = TextAnalysis.hashedEmbedding(text, dim)
          v.iterator.zipWithIndex.map { case (x, i) => (id, i.toLong, x.toDouble) }
        }
        .toDF("doc_id", "idx", "val0")
        .select($"doc_id".cast("long").as("doc_id"), $"idx".as("idx"),
          round($"val0", 6).as("val"))
        .orderBy("doc_id", "idx")
    }, Some(
      s"""WITH ${hashedEmbCtes(64)}
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, r.i AS idx,
         |  round(coalesce((a.v / nullif(n.n, 0))::REAL, 0.0)::DOUBLE, 6) AS val
         |FROM documents d CROSS JOIN range(64) r(i)
         |LEFT JOIN acc a ON a.doc_id = d.doc_id AND a.idx = r.i
         |LEFT JOIN nrm n ON n.doc_id = d.doc_id
         |ORDER BY 1, 2""".stripMargin)),

    // the composition the t38 bridge exists for: near-dup document pairs
    // via cosine over hashed embeddings — text -> vector -> hyperplane LSH
    // blocking -> bucket cap -> exact cosine gate, reusing cosineDedup
    // unchanged. FULLY oracled end to end: the hashed vectors are bitwise
    // reproducible in SQL ((v/n)::REAL — v and n derive from identical
    // integer sums), so the v05 bucket/cap/pair machinery composes with
    // the t38 derivation directly. Zero-norm docs are filtered on both
    // sides (their cosine is NaN, which Spark and DuckDB order-compare
    // DIFFERENTLY — the filter keeps the lane engine-independent).
    Q("t39_hashed_neardup", (s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val hv = t(s, dir, "documents").select($"doc_id", $"text")
        .as[(Long, String)]
        .map { case (id, text) =>
          (id, TextAnalysis.hashedEmbedding(text, 64))
        }
        .filter(_._2.exists(_ != 0f))
      Similarity.cosineDedup(hv, threshold = 0.9, planes = 10)
        .select($"id_a".cast("long").as("id_a"),
          $"id_b".cast("long").as("id_b"), round($"sim", 6).as("sim"))
        .orderBy($"id_a", $"id_b")
    }, Some(
      s"""WITH ${hashedEmbCtes(64)},
         |dense AS (
         |  SELECT d.doc_id, r.i AS idx,
         |    coalesce((a.v / nullif(n.n, 0))::REAL, 0.0::REAL) AS val
         |  FROM documents d CROSS JOIN range(64) r(i)
         |  LEFT JOIN acc a ON a.doc_id = d.doc_id AND a.idx = r.i
         |  LEFT JOIN nrm n ON n.doc_id = d.doc_id),
         |hv AS (
         |  SELECT doc_id AS vec_id, list(val ORDER BY idx) AS embedding
         |  FROM dense GROUP BY 1
         |  HAVING max(abs(val)) > 0),
         |${hyperplaneCtes(10, "hv")},
         |banded AS (
         |  SELECT id, vec, ${probeList(10)} AS bucket FROM vb
         |), capped AS (
         |  SELECT * FROM banded
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= 1024
         |)
         |SELECT DISTINCT CAST(a.id AS BIGINT) AS id_a,
         |  CAST(b.id AS BIGINT) AS id_b, round($cosSql, 6) AS sim
         |FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.id < b.id
         |WHERE $cosSql >= 0.9
         |ORDER BY id_a, id_b""".stripMargin)),

    Q("t15_source_similarity", (s, dir) => {
      import s.implicits._
      val numHashes = 128
      graft.functions.MinHashAggregate.register(s, numHashes)
      val shingled = t(s, dir, "documents")
        .select($"source", $"text").as[(String, String)]
        .flatMap { case (source, text) =>
          graft.functions.TextAnalysis.shingleSet(text, 3).iterator
            .map(sh => (source, sh))
        }
        .toDF("source", "shingle")
      val pos = shingled.groupBy($"source")
        .agg(graft.functions.MinHashAggregate.minhashAgg($"shingle").as("sig"))
        .select($"source", posexplode($"sig").as(Seq("idx", "val")))
      pos.as("a").join(pos.as("b"),
          expr("a.idx = b.idx AND a.val = b.val AND a.source < b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(round(count(lit(1)) / numHashes.toDouble, 4).as("est_jaccard"))
        .orderBy($"source_a", $"source_b")
    }, Some(
      // the full MinHash sketch re-derived in SQL: per-source distinct
      // shingle hashes x 128 affine permutations (pa|1, pb from mix64 of
      // the slot index), slot value = min SIGNED hash (Scala Long order),
      // estimate = matching slots / 128. Deterministic integer arithmetic
      // end to end — an exact oracle, not an approximation bound.
      s"""WITH ${shingleCtes("source")}, hashes AS (
         |  SELECT DISTINCT source, ${mix64Sql(fnvSql)} AS h FROM sh
         |), params AS (
         |  SELECT i,
         |    list_transform([${mix64Sql("(2 * i + 1)::HUGEINT")}],
         |      p -> p - p % 2 + 1)[1] AS pa,
         |    ${mix64Sql("(2 * i + 2)::HUGEINT")} AS pb
         |  FROM range(128) r(i)
         |), sigs AS (
         |  SELECT source, i,
         |    min(${s64(mix64Sql(s"(${mul64Full("pa", "h")} + pb) % $M64"))}) AS sig
         |  FROM hashes, params GROUP BY source, i
         |)
         |SELECT a.source AS source_a, b.source AS source_b,
         | round(count(*) / 128.0, 4) AS est_jaccard
         |FROM sigs a JOIN sigs b
         |  ON a.i = b.i AND a.sig = b.sig AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // int8-quantized exact kNN: the corpus scans as (scale, codes) at 1/4
    // the bytes of float32; no re-rank needed (error ~ quantization noise)
    // FULLY oracled (r9 verdict): the quantizer is deterministic float32
    // arithmetic — scale = maxAbs/127f, code = round(v/scale) i.e.
    // floor(x + 0.5f), byte wrap — which DuckDB reproduces in its REAL
    // domain; the scan is exact-over-codes so top-3 is a plain window.
    // The bounded per-partition heaps' (sim desc, nid asc) tie-break makes
    // the Spark result partitioning-independent, hence SQL-reproducible.
    Q("v08_int8_knn", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.int8Knn(v.filter(_._1 < 20), v, k = 3)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, Some(
      """WITH q AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    list_max(list_transform(embedding, x -> abs(x))) AS maxabs
        |  FROM embeddings
        |), scaled AS (
        |  SELECT id, vec,
        |    CASE WHEN maxabs = 0 THEN 1::REAL ELSE maxabs / 127::REAL END
        |      AS scale
        |  FROM q
        |), coded AS (
        |  SELECT id, vec,
        |    list_transform(vec, x ->
        |      CAST((CAST(floor(x / scale + 0.5::REAL) AS BIGINT) + 128) % 256
        |        - 128 AS BIGINT)) AS codes
        |  FROM scaled
        |), norms AS (
        |  SELECT id, vec, codes,
        |    sqrt(list_sum(list_transform(vec, x -> x::DOUBLE * x::DOUBLE)))
        |      AS qnorm,
        |    sqrt(list_sum(list_transform(codes, c -> c::DOUBLE * c::DOUBLE)))
        |      AS cnorm
        |  FROM coded
        |), scored AS (
        |  SELECT a.id AS qid, b.id AS nid,
        |    CASE WHEN a.qnorm = 0 OR b.cnorm = 0 THEN 0.0
        |      ELSE list_sum(list_transform(list_zip(a.vec, b.codes),
        |        z -> z[1]::DOUBLE * z[2]::DOUBLE)) / (a.qnorm * b.cnorm) END
        |      AS sim
        |  FROM norms a JOIN norms b ON a.id < 20 AND a.id <> b.id
        |)
        |SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
        |  round(sim, 6) AS sim
        |FROM (SELECT qid, nid, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn FROM scored)
        |WHERE rn <= 3 ORDER BY qid, sim DESC, nid""".stripMargin)),

    // PQ ANN: 8-byte codes scanned instead of 64-dim float vectors, bounded
    // per-partition candidate heaps, exact re-rank of survivors only.
    // FULLY oracled (r10 verdict ask): codebooks are per-subspace INTEGER
    // Lloyd's on the quantized sample (pqCtes re-derives training and
    // encoding), dot tables / norms are exact longs, the approximate
    // cosine is a double function of exact integers, and the candidate set
    // is the global top-rr per query by (approx sim desc, nid asc) — the
    // per-partition heaps only prune. Recall gates stay in DedupSpec.
    Q("v07_pq_knn", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.pqKnn(v.filter(_._1 < 20), v, k = 3, subspaces = 8,
        centroids = 16, rerank = 24)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, Some {
      val enc = (0 until 8).map(si =>
        s"SELECT vec_id, $si AS s, cid FROM enc$si").mkString("\n  UNION ALL ")
      val qt = (0 until 8).map(si =>
        s"""SELECT p.vec_id AS qid, $si AS s, c.cid,
           |    CAST(list_sum(list_transform(list_zip(p.v, c.m),
           |      z -> z[1]*z[2])) AS BIGINT) AS dot
           |  FROM b$si p CROSS JOIN s${si}c3 c WHERE p.vec_id < 20"""
          .stripMargin).mkString("\n  UNION ALL ")
      val cn = (0 until 8).map(si =>
        s"SELECT $si AS s, cid, CAST(list_sum(list_transform(m, " +
          s"x -> x*x)) AS BIGINT) AS n2 FROM s${si}c3").mkString("\n  UNION ALL ")
      s"""WITH ${pqCtes(8, 16, 3, 64, 256)},
         |enc AS (
         |  $enc),
         |qt AS (
         |  $qt),
         |cn AS (
         |  $cn),
         |qn AS (
         |  SELECT vec_id AS qid,
         |    sqrt(CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT)::DOUBLE)
         |      AS qnorm
         |  FROM qv WHERE vec_id < 20),
         |approx AS (
         |  SELECT t.qid, e.vec_id AS nid, sum(t.dot) AS dot, sum(c.n2) AS n2
         |  FROM enc e JOIN qt t ON t.s = e.s AND t.cid = e.cid
         |    JOIN cn c ON c.s = e.s AND c.cid = e.cid
         |  WHERE t.qid <> e.vec_id
         |  GROUP BY 1, 2),
         |asim AS (
         |  SELECT a.qid, a.nid,
         |    CASE WHEN qn.qnorm = 0 OR a.n2 = 0 THEN 0.0
         |      ELSE a.dot::DOUBLE / (qn.qnorm * sqrt(a.n2::DOUBLE)) END AS a
         |  FROM approx a JOIN qn USING (qid)),
         |cand AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY a DESC, nid ASC) AS rn FROM asim)
         |  WHERE rn <= 24),
         |ev AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |scored AS (
         |  SELECT c.qid, c.nid, $cosSql AS sim
         |  FROM cand c JOIN ev a ON a.id = c.qid JOIN ev b ON b.id = c.nid)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
         |  round(sim, 6) AS sim
         |FROM (SELECT qid, nid, sim, row_number() OVER (
         |    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn FROM scored)
         |WHERE rn <= 3 ORDER BY qid, sim DESC, nid""".stripMargin
    }, bench = true),

    // IVF-PQ ANN (IVFADC): coarse integer k-means cells + product-quantized
    // RESIDUALS, probed-cell table scan, exact re-rank — the composition
    // 100 TB similarity search ships (cell pruning bounds the scan,
    // residual codes bound the bytes). FULLY oracled: coarse training,
    // cell assignment, residuals, per-subspace codebooks, encodings, the
    // probe list, and the exact-long table decomposition of the
    // approximate cosine are all re-derived in SQL (ivfPqCtes + the CTEs
    // below); recall gates vs brute force live in DedupSpec.
    // queryBound = 7 < Q = 20: the oracle also covers the sharded query
    // path here (training + codebooks shared across the three shards).
    Q("v10_ivfpq_knn", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.ivfPqKnn(v.filter(_._1 < 20), v, k = 3, nCells = 8,
        nProbe = 3, subspaces = 8, centroids = 16, rerank = 24,
        queryBound = 7)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, Some {
      val enc = (0 until 8).map(si =>
        s"SELECT vec_id, $si AS s, cid FROM enc$si").mkString("\n  UNION ALL ")
      val qt = (0 until 8).map { si =>
        val lo = si * 8 + 1; val hi = (si + 1) * 8
        s"""SELECT p.vec_id AS qid, $si AS s, c.cid,
           |    CAST(list_sum(list_transform(list_zip(p.v[$lo:$hi], c.m),
           |      z -> z[1]*z[2])) AS BIGINT) AS dot
           |  FROM qv p CROSS JOIN s${si}cb c WHERE p.vec_id < 20"""
          .stripMargin
      }.mkString("\n  UNION ALL ")
      val cx = (0 until 8).map { si =>
        val lo = si * 8 + 1; val hi = (si + 1) * 8
        s"""SELECT g.cid AS cell, $si AS s, c.cid,
           |    CAST(list_sum(list_transform(list_zip(g.m[$lo:$hi], c.m),
           |      z -> z[1]*z[2])) AS BIGINT) AS x
           |  FROM gcb g CROSS JOIN s${si}cb c""".stripMargin
      }.mkString("\n  UNION ALL ")
      val cn = (0 until 8).map(si =>
        s"SELECT $si AS s, cid, CAST(list_sum(list_transform(m, " +
          s"x -> x*x)) AS BIGINT) AS n2 FROM s${si}cb").mkString("\n  UNION ALL ")
      s"""WITH ${ivfPqCtes(8, 8, 16, 3, 64, 256)},
         |enc AS (
         |  $enc),
         |qt AS (
         |  $qt),
         |cx AS (
         |  $cx),
         |cn AS (
         |  $cn),
         |gcn AS (
         |  SELECT cid, CAST(list_sum(list_transform(m, x -> x*x)) AS BIGINT)
         |    AS n2 FROM gcb),
         |qn AS (
         |  SELECT vec_id AS qid,
         |    sqrt(CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT)::DOUBLE)
         |      AS qnorm
         |  FROM qv WHERE vec_id < 20),
         |probes AS (
         |  SELECT qid, cid, dotqc FROM (
         |    SELECT qid, cid, dotqc,
         |      row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn
         |    FROM (
         |      SELECT p.vec_id AS qid, c.cid,
         |        CAST(list_sum(list_transform(list_zip(p.v, c.m),
         |          z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist,
         |        CAST(list_sum(list_transform(list_zip(p.v, c.m),
         |          z -> z[1]*z[2])) AS BIGINT) AS dotqc
         |      FROM qv p CROSS JOIN gcb c WHERE p.vec_id < 20))
         |  WHERE rn <= 3),
         |approx AS (
         |  SELECT pr.qid, ca.vec_id AS nid, pr.dotqc, ca.cid AS cell,
         |    sum(t.dot) AS sdot, sum(2*cx.x + cn.n2) AS snn
         |  FROM casg ca
         |    JOIN probes pr ON pr.cid = ca.cid AND pr.qid <> ca.vec_id
         |    JOIN enc e ON e.vec_id = ca.vec_id
         |    JOIN qt t ON t.qid = pr.qid AND t.s = e.s AND t.cid = e.cid
         |    JOIN cx ON cx.cell = ca.cid AND cx.s = e.s AND cx.cid = e.cid
         |    JOIN cn ON cn.s = e.s AND cn.cid = e.cid
         |  GROUP BY 1, 2, 3, 4),
         |asim AS (
         |  SELECT a.qid, a.nid,
         |    CASE WHEN qn.qnorm = 0 OR (g.n2 + a.snn) <= 0 THEN 0.0
         |      ELSE (a.dotqc + a.sdot)::DOUBLE
         |        / (qn.qnorm * sqrt((g.n2 + a.snn)::DOUBLE)) END AS a
         |  FROM approx a JOIN qn USING (qid) JOIN gcn g ON g.cid = a.cell),
         |cand AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY a DESC, nid ASC) AS rn FROM asim)
         |  WHERE rn <= 24),
         |ev AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |scored AS (
         |  SELECT c.qid, c.nid, $cosSql AS sim
         |  FROM cand c JOIN ev a ON a.id = c.qid JOIN ev b ON b.id = c.nid)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
         |  round(sim, 6) AS sim
         |FROM (SELECT qid, nid, sim, row_number() OVER (
         |    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn FROM scored)
         |WHERE rn <= 3 ORDER BY qid, sim DESC, nid""".stripMargin
    }, bench = true),

    // hyperplane-LSH ANN, FULLY oracled (r9 verdict): the candidate set is
    // approximate vs brute force but DETERMINISTIC — mix64 hyperplanes,
    // sign buckets, single-bit multi-probe — so DuckDB re-derives the
    // identical buckets -> candidates -> exact-cosine top-3
    Q("v04_knn_lsh", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.lshKnn(v.filter(_._1 < 20), v, k = 3, planes = 10)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, Some(
      s"""WITH ${hyperplaneCtes(10)},
         |probes AS (
         |  SELECT id AS qid, ${probeList(10)} AS bucket
         |  FROM vb WHERE id < 20
         |), cand AS (
         |  SELECT DISTINCT p.qid, b.id AS nid
         |  FROM probes p JOIN vb b USING (bucket)
         |  WHERE p.qid <> b.id
         |), scored AS (
         |  SELECT c.qid, c.nid, $cosSql AS sim
         |  FROM cand c JOIN vb a ON a.id = c.qid JOIN vb b ON b.id = c.nid
         |)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
         |  round(sim, 6) AS sim
         |FROM (SELECT qid, nid, sim, row_number() OVER (
         |    PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn FROM scored)
         |WHERE rn <= 3 ORDER BY qid, sim DESC, nid""".stripMargin),
      bench = true),

    // multimodal plumbing end to end on driver data: deterministic 8x8 PNGs
    // rendered from document text (real imageio encode), then the REAL
    // decode path — sniff -> describe (true dims) -> grid-pooled features
    Q("m01_media_features", (s, dir) => {
      import s.implicits._
      val media = docs(s, dir).map { case (id, text) =>
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var h = graft.functions.TextAnalysis.mix64(text.hashCode.toLong)
        for (p <- 0 until 64) {
          h = graft.functions.TextAnalysis.mix64(h + p)
          img.setRGB(p % 8, p / 8, (h & 0xffffff).toInt)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }.toDF("id", "data")
      val desc = graft.functions.Multimodal.describe(media, "id", "data")
        .select($"media_id", $"format", $"width", $"height")
      val feats = graft.functions.Multimodal.withFeatures(media, "id", "data",
          dim = 4)
        .select($"media_id", round(element_at($"features", 1), 4).as("f0"),
          round(element_at($"features", 4), 4).as("f3"))
      desc.join(feats, "media_id")
        .orderBy($"media_id")
    }, Some(Q.golden("m01_media_sf001.tsv", "media_id" -> "BIGINT",
      "format" -> "VARCHAR", "width" -> "INTEGER", "height" -> "INTEGER",
      "f0" -> "FLOAT", "f3" -> "FLOAT"))),

    // multimodal audio end to end on driver data: deterministic PCM
    // synthesized from document text (mix64-chained samples), REAL WAV
    // encode (JDK writer), then the REAL decode path — sniff -> header
    // info -> int16 round trip -> RMS energy envelope. Rows-only for the
    // driver; golden_m02.py re-derives the envelopes analytically (the
    // samples are fully determined BEFORE the WAV round trip) and
    // GoldenPipelineSpec pins them.
    Q("m02_audio_features", (s, dir) => {
      import s.implicits._
      val media = docs(s, dir).map { case (id, text) =>
        var h = graft.functions.TextAnalysis.mix64(text.hashCode.toLong ^ 0x5eedL)
        val samples = Array.tabulate(800) { i =>
          h = graft.functions.TextAnalysis.mix64(h + i)
          (h >> 11).toFloat / (1L << 52).toFloat
        }
        (id, graft.functions.Multimodal.AudioCodecs.encodeWavPcm16(samples, 8000f))
      }.toDF("id", "data")
      val desc = graft.functions.Multimodal.describeAudio(media, "id", "data")
        .select($"media_id", $"format", round($"sample_rate", 1).as("sample_rate"),
          $"channels", $"n_frames", round($"duration_s", 4).as("duration_s"))
      val feats = graft.functions.Multimodal
        .withFeatures(media, "id", "data", dim = 8)
        .select($"media_id", round(element_at($"features", 1), 4).as("e0"),
          round(element_at($"features", 8), 4).as("e7"))
      desc.join(feats, "media_id")
        .orderBy($"media_id")
    }, Some(Q.golden("m02_audio_sf001.tsv", "media_id" -> "BIGINT",
      "format" -> "VARCHAR", "sample_rate" -> "DOUBLE",
      "channels" -> "INTEGER", "n_frames" -> "BIGINT",
      "duration_s" -> "DOUBLE", "e0" -> "FLOAT", "e7" -> "FLOAT"))),

    // multimodal "video" plumbing: deterministic binary blobs -> fixed-
    // offset frame decimation (every 4th 256-byte chunk) -> per-frame md5.
    // The decode itself is stubbed by necessity (no codec libraries in this
    // environment) but the dataflow — binary column in, per-frame rows out,
    // digests aggregated — is the real frame-sampling shape; golden_m03.py
    // re-derives every digest in pure Python.
    Q("m03_frame_sample", (s, dir) => {
      import s.implicits._
      val media = docs(s, dir).map { case (id, text) =>
        var h = graft.functions.TextAnalysis.mix64(text.hashCode.toLong ^ 0xf1a6e5L)
        val bytes = new Array[Byte](4096)
        var i = 0
        while (i < bytes.length) {
          h = graft.functions.TextAnalysis.mix64(h)
          bytes(i) = (h & 0xff).toByte
          i += 1
        }
        (id, bytes)
      }.toDF("id", "data")
      graft.functions.Multimodal
        .sampleFrames(media, "id", "data", frameBytes = 256, everyNth = 4)
        .select($"media_id", $"frame_idx".cast("long").as("frame_idx"),
          md5($"frame_bytes").as("frame_md5"))
        .orderBy($"media_id", $"frame_idx")
    }, Some(Q.golden("m03_frames_sf001.tsv", "media_id" -> "BIGINT",
      "frame_idx" -> "BIGINT", "frame_md5" -> "VARCHAR"))),

    // multimodal VIDEO metadata end to end: deterministic ISO-BMFF (MP4)
    // headers assembled per document (mix64-derived timescale/duration/
    // dims, real public-spec box layout via VideoCodecs.encodeMp4Header),
    // then the REAL parse path — sniff (ftyp) -> box walk -> mvhd
    // timescale+duration, tkhd 16.16 dims. The duration/resolution/track
    // metadata a curation pipeline filters on parses from real container
    // bytes; only frame-pixel decode stays stubbed (README "Unsupported
    // media codecs"). golden_m04.py re-derives every field analytically.
    Q("m04_video_meta", (s, dir) => {
      import s.implicits._
      val media = docs(s, dir).map { case (id, text) =>
        var h = graft.functions.TextAnalysis.mix64(text.hashCode.toLong ^ 0x51deaL)
        val timescale = 600L + java.lang.Long.remainderUnsigned(h, 90000L)
        h = graft.functions.TextAnalysis.mix64(h)
        val durTicks = java.lang.Long.remainderUnsigned(h, 10000000L)
        h = graft.functions.TextAnalysis.mix64(h)
        val w = (16L * (1L + java.lang.Long.remainderUnsigned(h, 256L))).toInt
        h = graft.functions.TextAnalysis.mix64(h)
        val ht = (16L * (1L + java.lang.Long.remainderUnsigned(h, 256L))).toInt
        h = graft.functions.TextAnalysis.mix64(h)
        val mdat = new Array[Byte](64 + (h & 0xff).toInt)
        (id, graft.functions.Multimodal.VideoCodecs.encodeMp4Header(
          "isom", timescale, durTicks, w, ht, mdat))
      }.toDF("id", "data")
      graft.functions.Multimodal.describeVideo(media, "id", "data")
        .select($"media_id", $"format", $"n_bytes", $"brand",
          $"timescale", round($"duration_s", 6).as("duration_s"),
          $"n_tracks", $"width", $"height")
        .orderBy($"media_id")
    }, Some(Q.golden("m04_video_sf001.tsv", "media_id" -> "BIGINT",
      "format" -> "VARCHAR", "n_bytes" -> "BIGINT", "brand" -> "VARCHAR",
      "timescale" -> "BIGINT", "duration_s" -> "DOUBLE",
      "n_tracks" -> "INTEGER", "width" -> "INTEGER",
      "height" -> "INTEGER"))),

    Q("v05_cosine_dedup", (s, dir) => {
      import s.implicits._
      // random 64-dim embeddings rarely exceed ~0.3 cosine; 0.25 keeps the
      // check non-vacuous while still exercising the bucketed-pairs path.
      // FULLY oracled (r9 verdict): the banded candidate pair set is
      // deterministic (mix64 hyperplanes + single-bit probes + the 1024
      // bucket cap), so DuckDB reproduces buckets -> cap -> pairs -> gate.
      Similarity.cosineDedup(vecs(s, dir), threshold = 0.25, planes = 10)
        .select($"id_a".cast("long").as("id_a"), $"id_b".cast("long").as("id_b"),
          round($"sim", 6).as("sim"))
        .orderBy($"id_a", $"id_b")
    }, Some(
      s"""WITH ${hyperplaneCtes(10)},
         |banded AS (
         |  SELECT id, vec, ${probeList(10)} AS bucket FROM vb
         |), capped AS (
         |  SELECT * FROM banded
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= 1024
         |)
         |SELECT DISTINCT CAST(a.id AS BIGINT) AS id_a,
         |  CAST(b.id AS BIGINT) AS id_b, round($cosSql, 6) AS sim
         |FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.id < b.id
         |WHERE $cosSql >= 0.25
         |ORDER BY id_a, id_b""".stripMargin)),

    // exact cosine near-dup pairs over a bounded probe set: the brute-force
    // counterpart of v05, DuckDB-oracled end to end through the native
    // codegen'd cosine Expression. The probe bound keeps the join linear in
    // corpus size (probe x corpus, never corpus x corpus) — the same shape
    // a decontamination "is any of THESE documents near anything?" scan has
    // at 100 TB; id_a < id_b dedups the in-probe pairs.
    Q("v09_cosine_pairs_exact", (s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
        .filter($"id_a" < 100)
      val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
      // broadcast the BOUNDED probe side explicitly: left to stats, Spark
      // happily builds on the corpus side at toy scale — which would be a
      // corpus-wide broadcast (or a cartesian) at 100 TB. BuildLeft streams
      // the corpus exactly once.
      broadcast(a).join(b, $"id_a" < $"id_b")
        .select($"id_a".cast("long").as("id_a"),
          $"id_b".cast("long").as("id_b"),
          Similarity.cosineCol($"va", $"vb").as("sim"))
        .filter($"sim" >= 0.25)
        .select($"id_a", $"id_b", round($"sim", 6).as("sim"))
        .orderBy($"id_a", $"id_b")
    }, Some(
      """SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
        | round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |     p -> p[1]::DOUBLE * p[2]::DOUBLE)) /
        |   (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE))) *
        |    sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < 100 AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |     p -> p[1]::DOUBLE * p[2]::DOUBLE)) /
        |   (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE))) *
        |    sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) >= 0.25
        |ORDER BY id_a, id_b""".stripMargin))
  )
}
