package graft.operators

import org.apache.spark.sql.functions._
import Q.t

/** Text / training-data-pipeline operators over the `documents` table that are
  * expressible in ANSI SQL (so the DuckDB oracle verifies them exactly):
  * exact dedup, prefix-block near-dup candidates, token counting, quality
  * scoring, word-frequency (explode/generator shape).
  *
  * The non-SQL-expressible ops (MinHash LSH, SimHash, n-gram Jaccard,
  * language-ID) live in [[Dedup]] / [[TextAnalysis]] with rows-only checks.
  */
object TextQueries {

  /** Token-budget sequence packing: documents hash into `16^hexChars`
    * md5-prefix groups; inside each group a running token sum cuts
    * greedy bins of ~`budget` tokens (deterministic: group + doc_id order,
    * never a global-order window — a single-partition global sort would be
    * the bottleneck at corpus scale). `hexChars` sets the parallelism
    * ceiling: 2 (256 groups) is plenty at gate scale and keeps the oracle
    * pinned, but a 10k-core cluster wants 3+ (4096+ groups) — the within-
    * group windows are unchanged, so widening only re-buckets documents.
    * Returns one row per (grp, bin): doc and token counts. */
  def packBins(docs: org.apache.spark.sql.DataFrame, budget: Long,
      hexChars: Int = 2): org.apache.spark.sql.DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars out of range: $hexChars")
    val tr = trim(col("text"))
    val toks = when(tr === "", 0L)
      .otherwise(length(tr) - length(regexp_replace(tr, " ", "")) + 1L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1,
          hexChars).as("grp"),
        toks.as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("bin", ((col("cum") - col("n_toks")) / budget).cast("long"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_toks")).cast("long").as("sum_tokens"))
      .orderBy(col("grp"), col("bin"))
  }

  /** PII patterns (t32): RE2-safe subset — no backreferences/lookaround, so
    * Java regex (Spark) and RE2 (DuckDB) produce identical matches. No
    * octet-range validation on IPs (standard for scrubbing: over-match). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b555-\\d{4}\\b"

  /** Redact PII in order email → IP → phone (the email pass removes
    * addresses whose domains could otherwise shadow later patterns). */
  def redactPii(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "<EMAIL>"), IpRe, "<IP>"), PhoneRe, "<PHONE>")

  /** Whitespace token count of `text` (t27's formula): 0 for blank. */
  private def tokenCount(text: org.apache.spark.sql.Column) = {
    val tr = trim(text)
    when(tr === "", 0L)
      .otherwise(length(tr) - length(regexp_replace(tr, " ", "")) + 1L)
  }

  /** Materialize a [[mixtureWeights]] allocation into an actual sampled
    * corpus (t36 kernel): each source's keep probability is
    * min(1, alloc_tokens / n_tokens); a document is kept iff the first 8
    * hex chars of md5(doc_id), read as a 32-bit fraction, fall under that
    * threshold. Same decision on every engine and every partitioning — the
    * reproducible alternative to rand() sampling, and the step that turns a
    * data recipe's weights into the training corpus. The weights frame is
    * |sources| rows and explicitly broadcast; the corpus is touched by one
    * scan + one map-side join, no shuffle until the reporting rollup. */
  def temperatureSample(docs: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = mixtureWeights(docs, budget)
      .select($"source", $"n_tokens".as("src_tokens"), $"alloc_tokens")
    // p <= 1 always (least caps the 0-token inf); the hex threshold is
    // floor(p * 2^32) zero-padded to 8 chars, compared lexicographically
    // against the md5 prefix — both lowercase 8-char hex, so string order
    // IS numeric order
    val p = least(lit(1.0), $"alloc_tokens".cast("double") / $"src_tokens")
    val thr = lpad(lower(hex(floor(p * lit(4294967296.0)).cast("long"))), 8, "0")
    val frac = substring(md5($"doc_id".cast("string").cast("binary")), 1, 8)
    docs.join(broadcast(w), "source")
      .withColumn("p", p)
      .withColumn("keep", $"alloc_tokens" >= $"src_tokens" || frac < thr)
      .groupBy($"source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).cast("long").as("n_kept"),
        sum(when($"keep", tokenCount($"text")).otherwise(0L)).cast("long")
          .as("kept_tokens"),
        round(max($"p"), 4).as("target_frac"))
      .orderBy($"source")
  }

  /** Temperature-flattened training-mixture allocation (t33 kernel): per
    * source, token totals -> integer weight floor(sqrt(tokens)) (alpha=0.5)
    * -> exact round-half-up rational share of `budget`, plus the implied
    * epochs rate. |sources| rows; only the first scan touches the corpus. */
  def mixtureWeights(docs: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    val bySource = docs
      .select(col("source"), tokenCount(col("text")).as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_toks")).cast("long").as("n_tokens"))
      // IEEE-correctly-rounded sqrt: identical longs in any engine
      .withColumn("wt", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val tw = bySource.select(sum(col("wt")).as("tw"))
    bySource.crossJoin(broadcast(tw))
      .withColumn("alloc_tokens",
        expr(s"CAST((${2 * budget} * wt + tw) DIV (2 * tw) AS BIGINT)"))
      .withColumn("epochs", when(col("n_tokens") === 0L, lit(0.0))
        .otherwise(round(col("alloc_tokens").cast("double") / col("n_tokens"), 4)))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("wt"),
        col("alloc_tokens"), col("epochs"))
      .orderBy(col("source"))
  }

  /** Bloom-prefiltered exact decontamination (t34 kernel): eval word-n-grams
    * fold into one 2^logm-bit filter; the collected bitset rides the plan as
    * a literal and the codegen'd probe prunes corpus grams before the exact
    * md5 confirm join. No false negatives => identical to the plain join.
    * Inputs are (doc_id, text) frames; returns per corpus doc with ≥ n words
    * (doc_id, n_grams, n_contam, keep). */
  def bloomDecon(corpus: org.apache.spark.sql.DataFrame,
      evalDocs: org.apache.spark.sql.DataFrame, n: Int = 5, logm: Int = 20,
      probes: Int = 5): org.apache.spark.sql.DataFrame = {
    import graft.functions.BloomFilterAggregate
    BloomFilterAggregate.register(corpus.sparkSession, logm, probes)
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1})," +
          s" i -> array_join(slice(w, i, $n), ' '))")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h64"), md5(col("g")).as("h"))
    val evalG = grams(evalDocs)
    // one fixed-size row — the only driver-side state
    val bits: Array[Long] = evalG
      .agg(BloomFilterAggregate.bloomAgg(col("h64")))
      .head().getSeq[Long](0).toArray
    val evalSet = evalG.select(col("h")).distinct()
    // gram totals from size(w) arithmetic — the count never explodes
    val totals = corpus
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), (size(col("w")) - (n - 1)).cast("long").as("n_grams"))
    val hits = grams(corpus)
      .filter(BloomFilterAggregate.bloomContains(typedlit(bits), col("h64")))
      .join(evalSet, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id").cast("long").as("doc_id"), col("n_grams"),
        coalesce(col("n_contam"), lit(0L)).cast("long").as("n_contam"))
      .withColumn("keep", col("n_contam") === 0L)
      .orderBy(col("doc_id"))
  }

  val queries: Seq[Q] = Seq(
    // ---- exact dedup: content-hash grouping, keep lowest doc_id ----
    Q("t01_dedup_exact", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(md5($"text".cast("binary")).as("h"), $"doc_id")
        .groupBy($"h")
        .agg(count(lit(1)).cast("long").as("cnt"),
          min($"doc_id").cast("long").as("keep"))
        .orderBy($"h")
    }, Some(
      """SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(min(doc_id) AS BIGINT) AS keep
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // ---- near-dup candidate blocking on a content prefix ----
    Q("t02_dedup_prefix_block", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(md5(substring($"text", 1, 40).cast("binary")).as("block"), $"doc_id")
        .groupBy($"block")
        .agg(count(lit(1)).cast("long").as("cnt"),
          min($"doc_id").cast("long").as("keep"))
        .filter($"cnt" > 1)
        .orderBy($"block")
    }, Some(
      """SELECT md5(substr(text, 1, 40)) AS block, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(min(doc_id) AS BIGINT) AS keep
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin)),

    // ---- token counting (whitespace tokens, engine-neutral arithmetic) ----
    Q("t03_token_count", (s, dir) => {
      import s.implicits._
      val tr = trim($"text")
      t(s, dir, "documents")
        .select($"doc_id".cast("long").as("doc_id"),
          when(tr === "", 0L)
            .otherwise(length(tr) - length(regexp_replace(tr, " ", "")) + 1L)
            .cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    }, Some(
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | CAST(CASE WHEN trim(text) = '' THEN 0
        |   ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
        |   END AS BIGINT) AS n_tokens
        |FROM documents ORDER BY 1""".stripMargin)),

    // ---- quality scoring: length, avg word length, stopword count ----
    Q("t04_quality_score", (s, dir) => {
      import s.implicits._
      val tr = trim($"text")
      val chars = length(regexp_replace(tr, " ", ""))
      val toks = when(tr === "", 0L)
        .otherwise(length(tr) - length(regexp_replace(tr, " ", "")) + 1L)
      t(s, dir, "documents")
        .select($"doc_id".cast("long").as("doc_id"),
          length($"text").cast("long").as("len"),
          round(chars.cast("double") / toks.cast("double"), 4).as("avg_word_len"),
          ((length($"text") - length(regexp_replace($"text", " the ", "_")))
            / lit(4)).cast("long").as("the_cnt"))
        .orderBy($"doc_id")
    }, Some(
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | CAST(length(text) AS BIGINT) AS len,
        | round(CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) /
        |   CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS DOUBLE),
        |   4) AS avg_word_len,
        | CAST((length(text) - length(replace(text, ' the ', '_'))) / 4 AS BIGINT) AS the_cnt
        |FROM documents ORDER BY 1""".stripMargin)),

    // ---- repetition quality signal: repeated-token fraction per doc ----
    Q("t14_repetition", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", explode(split(trim($"text"), " ")).as("w"))
        .filter($"w" =!= "")
        .groupBy($"doc_id".cast("long").as("doc_id"))
        .agg(round(lit(1.0) - countDistinct($"w").cast("double") /
          count(lit(1)).cast("double"), 4).as("rep_ratio"),
          count(lit(1)).cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    }, Some(
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        | round(1.0 - CAST(count(DISTINCT w) AS DOUBLE) / count(*), 4) AS rep_ratio,
        | CAST(count(*) AS BIGINT) AS n_tokens
        |FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        |      FROM documents)
        |WHERE w <> '' GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- generator / explode shape: corpus word frequencies, top 20 ----
    Q("t05_word_freq", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word").agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy($"cnt".desc, $"word".asc)
        .limit(20)
    }, Some(
      """SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY 1 ORDER BY cnt DESC, word ASC LIMIT 20""".stripMargin)),

    // ---- stable split assignment: deterministic id arithmetic gives every
    // doc a reproducible train/val/test slot — the curation op behind
    // leakage-free dataset splits (never random() at corpus scale) ----
    Q("t16_stable_split", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("split",
          when($"doc_id" % 10 === 0, "test")
            .when($"doc_id" % 10 === 1, "val")
            .otherwise("train"))
        .groupBy($"split", $"source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum($"n_chars").cast("long").as("sum_chars"))
        .orderBy($"split", $"source")
    }, Some(
      """SELECT CASE WHEN doc_id % 10 = 0 THEN 'test'
        |            WHEN doc_id % 10 = 1 THEN 'val'
        |            ELSE 'train' END AS split,
        | source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- per-source quota: keep the k largest docs per source (domain
    // balancing). A bounded native top-k aggregate, NOT a window rank: the
    // partial aggregation keeps <= k rows per source per map task and the
    // final merge folds k-sized heaps, so no task ever sorts a whole
    // source — with a handful of sources at 100 TB a
    // row_number().over(partitionBy(source)) window would put an entire
    // source's corpus through one task ----
    Q("t17_source_quota", (s, dir) => {
      import s.implicits._
      graft.functions.TopKAggregate.register(s, k = 5,
        desc = Seq(true, false), name = "topk_quota")
      t(s, dir, "documents")
        .groupBy($"source")
        .agg(graft.functions.TopKAggregate
          .topK("topk_quota", struct($"n_chars", $"doc_id")).as("top"))
        .select($"source", posexplode($"top"))
        .select($"source", $"col.doc_id".as("doc_id"),
          ($"pos" + 1).cast("long").as("rk"))
        .orderBy($"source", $"rk")
    }, Some(
      """SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY source, rk""".stripMargin)),

    // ---- benchmark decontamination: flag docs containing any probe n-gram
    // (substring screen against a small eval-set sample — the blocklist
    // broadcasts; the scan stays a narrow map over the corpus) ----
    Q("t18_decontaminate", (s, dir) => {
      import s.implicits._
      val probes = Seq("order data column", "stream fast order",
        "small line customer")
      t(s, dir, "documents")
        .select($"doc_id", explode(array(probes.map(lit): _*)).as("probe"),
          $"text")
        .filter($"text".contains($"probe"))
        .groupBy($"probe")
        .agg(count(lit(1)).cast("long").as("n_contaminated"),
          min($"doc_id").cast("long").as("first_doc"))
        .orderBy($"probe")
    }, Some(
      """SELECT p AS probe, CAST(count(*) AS BIGINT) AS n_contaminated,
        | CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM documents, unnest(['order data column', 'stream fast order',
        |  'small line customer']) AS t(p)
        |WHERE contains(text, p)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- the composed curation pipeline in one plan: quality gate (token
    // range) -> exact dedup (keep lowest doc_id per content hash, a window
    // rank) -> stable split assignment -> per-(split, source) survivors.
    // One shuffle for the dedup window, one for the final rollup ----
    Q("t19_curation_pipeline", (s, dir) => {
      import s.implicits._
      val tr = trim($"text")
      val toks = when(tr === "", 0L)
        .otherwise(length(tr) - length(regexp_replace(tr, " ", "")) + 1L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"h").orderBy($"doc_id")
      t(s, dir, "documents")
        .withColumn("n_toks", toks)
        .filter($"n_toks".between(10, 500))
        .withColumn("h", md5($"text".cast("binary")))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .withColumn("split",
          when($"doc_id" % 10 === 0, "test")
            .when($"doc_id" % 10 === 1, "val")
            .otherwise("train"))
        .groupBy($"split", $"source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum($"n_toks").cast("long").as("sum_tokens"))
        .orderBy($"split", $"source")
    }, Some(
      """WITH gated AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN trim(text) = '' THEN 0
        |      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
        |      END AS n_toks
        |  FROM documents
        |), deduped AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY md5(text) ORDER BY doc_id) AS rk
        |  FROM gated WHERE n_toks BETWEEN 10 AND 500
        |)
        |SELECT CASE WHEN doc_id % 10 = 0 THEN 'test'
        |            WHEN doc_id % 10 = 1 THEN 'val'
        |            ELSE 'train' END AS split,
        | source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_toks) AS BIGINT) AS sum_tokens
        |FROM deduped WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = true),

    // ---- corpus bigram top-k: the n-gram statistics pass behind contamination
    // screens and repetition analyses (generator + shifted-pair shape) ----
    Q("t20_bigram_topk", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(split(trim($"text"), " ").as("w"))
        .filter(size($"w") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w)-1)," +
            " i -> concat(element_at(w, i), ' ', element_at(w, i+1)))"))
          .as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy($"cnt".desc, $"bigram".asc)
        .limit(20)
    }, Some(
      """SELECT g AS bigram, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS g
        |  FROM (SELECT string_split(trim(text), ' ') AS w FROM documents)
        |  WHERE len(w) >= 2)
        |GROUP BY 1 ORDER BY cnt DESC, bigram ASC LIMIT 20""".stripMargin)),

    // ---- exact substring-span dedup (Lee et al. 2022): maximal duplicated
    // word-8-gram spans per document — the span-level pass that removes
    // repeated boilerplate WITHIN otherwise-unique documents, which
    // document-level dedup (t01/t06) cannot see ----
    Q("t21_span_dedup", (s, dir) => {
      import s.implicits._
      Dedup.duplicateSpans(
          Q.fanOut(t(s, dir, "documents"), $"doc_id")
            .select($"doc_id", $"text").as[(Long, String)],
          n = 8)
        .select($"doc_id".cast("long").as("doc_id"),
          $"span_start".cast("long").as("span_start"),
          $"span_end".cast("long").as("span_end"),
          $"n_dup_grams".cast("long").as("n_dup_grams"))
        .orderBy($"doc_id", $"span_start")
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, unnest(range(1, len(w) - 6)) AS pos, w
        |  FROM words WHERE len(w) >= 8
        |), grams AS (
        |  SELECT doc_id, pos, md5(array_to_string(w[pos:pos+7], ' ')) AS h
        |  FROM pos
        |), cnt AS (
        |  SELECT h, count(*) AS c FROM grams GROUP BY 1
        |), dup AS (
        |  SELECT doc_id, pos FROM grams JOIN cnt USING (h) WHERE c > 1
        |), isl AS (
        |  SELECT doc_id, pos, sum(CASE WHEN prev IS NULL OR pos - prev > 8
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM dup)
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 7 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_dup_grams
        |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin),
      bench = true),

    // ---- unigram Shannon entropy per document: the distributional quality
    // signal behind gibberish/boilerplate filters (low entropy = repetitive
    // or templated text). entropy = log2(T) - sum(c*log2(c))/T needs only
    // per-(doc, word) counts — two partial-aggregated shuffles, no
    // full-vocabulary state per document ----
    Q("t22_entropy", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", explode(split(trim($"text"), " ")).as("wd"))
        .filter($"wd" =!= "")
        .groupBy($"doc_id", $"wd").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id".cast("long").as("doc_id"))
        .agg(sum($"c").cast("long").as("n_tokens"),
          round(log2(sum($"c")) -
            sum($"c" * log2($"c")) / sum($"c"), 4).as("entropy"))
        .orderBy($"doc_id")
    }, Some(
      """WITH wc AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY 1, 2
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
        |FROM wc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- per-source distinctive vocabulary (tf-idf): corpus document
    // frequency joined back to per-source term frequency — the canonical
    // two-pass global-statistics shape (a 100 TB corpus never fits a
    // driver-side vocabulary; DF is itself a distributed aggregate, and the
    // scalar doc count rides a one-row broadcast). Ranking uses the ROUNDED
    // score with a term tie-break so both engines order identically, and
    // rides the bounded top-k aggregate — a source's whole vocabulary never
    // sorts in one task the way a per-source row_number window would ----
    Q("t23_tfidf_terms", (s, dir) => {
      import s.implicits._
      graft.functions.TopKAggregate.register(s, k = 3,
        desc = Seq(true, false), name = "topk_tfidf")
      val docs = t(s, dir, "documents")
      val words = docs
        .select($"doc_id", $"source", explode(split(trim($"text"), " ")).as("term"))
        .filter($"term" =!= "")
      val nDocs = docs.select(countDistinct($"doc_id").as("n_docs"))
      val df = words.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val tf = words.groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
      tf.join(df, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          round($"tf" * log($"n_docs".cast("double") / $"df"), 4))
        .groupBy($"source")
        .agg(graft.functions.TopKAggregate
          .topK("topk_tfidf", struct($"score", $"term", $"tf", $"df")).as("top"))
        .select($"source", posexplode($"top"))
        .select($"source", $"col.term".as("term"),
          $"col.tf".cast("long").as("tf"), $"col.df".cast("long").as("df"),
          $"col.score".as("score"), ($"pos" + 1).cast("long").as("rk"))
        .orderBy($"source", $"rk")
    }, Some(
      """WITH w2 AS (
        |  SELECT doc_id, source, term FROM (
        |    SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS term
        |    FROM documents)
        |  WHERE term <> ''
        |), n AS (
        |  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
        |), df AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM w2) GROUP BY 1
        |), tf AS (
        |  SELECT source, term, count(*) AS tf FROM w2 GROUP BY 1, 2
        |), ranked AS (
        |  SELECT source, term, tf, df,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) DESC,
        |        term ASC) AS rk
        |  FROM tf JOIN df USING (term), n
        |)
        |SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  score, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 3 ORDER BY source, rk""".stripMargin)),

    // ---- keep-first span strip (the APPLY side of t21): every duplicated
    // 8-gram occurrence except the globally-first is stripped; per-doc
    // removal stats quantify how much boilerplate the pass deletes.
    // Oracle shape note (r18): grams derive from zipped unnest + a windowed
    // string_agg rather than unnesting positions WITH the word-list column
    // carried per row, and keep-first uses an integer doc_id*2^20+pos key
    // (pos < 2^20 always: docs are far shorter) rather than struct min /
    // struct <> — the original shape made DuckDB materialize the list per
    // gram row and leak unboundedly past its memory_limit at sf1.0 (125 GB
    // RSS, OOM-killed); this one runs in 3 s there with identical output
    // (proven row-for-row at sf0.01/sf0.1/sf1.0 against the old SQL and
    // the Spark dump). ----
    Q("t24_span_strip", (s, dir) => {
      import s.implicits._
      Dedup.stripSpanStats(
          t(s, dir, "documents").select($"doc_id", $"text").as[(Long, String)],
          n = 8)
        .select($"doc_id".cast("long").as("doc_id"),
          $"n_words".cast("long").as("n_words"),
          $"n_removed".cast("long").as("n_removed"),
          $"n_kept".cast("long").as("n_kept"),
          $"n_spans".cast("long").as("n_spans"))
        .orderBy($"doc_id")
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, unnest(w) AS wd
        |  FROM words
        |), g8 AS (
        |  SELECT doc_id, pos,
        |    md5(string_agg(wd, ' ') OVER win) AS h,
        |    count(*) OVER win AS cw
        |  FROM tok
        |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
        |), grams AS (
        |  SELECT doc_id, pos, h FROM g8 WHERE cw = 8
        |), firsts AS (
        |  SELECT h, min(doc_id * 1048576 + pos) AS fk
        |  FROM grams GROUP BY 1 HAVING count(*) > 1
        |), fo AS (
        |  SELECT doc_id, pos FROM grams JOIN firsts USING (h)
        |  WHERE doc_id * 1048576 + pos <> fk
        |), isl AS (
        |  SELECT doc_id, pos, sum(CASE WHEN prev IS NULL OR pos - prev > 8
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM fo)
        |), spans AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
        |  FROM isl GROUP BY doc_id, grp
        |), rem AS (
        |  SELECT doc_id, sum(e - s + 1) AS n_removed, count(*) AS n_spans
        |  FROM spans GROUP BY 1
        |)
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |  CAST(len(w.w) AS BIGINT) AS n_words,
        |  CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
        |  CAST(len(w.w) - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept,
        |  CAST(COALESCE(r.n_spans, 0) AS BIGINT) AS n_spans
        |FROM documents d
        |  JOIN words w ON w.doc_id = d.doc_id
        |  LEFT JOIN rem r ON r.doc_id = d.doc_id
        |ORDER BY doc_id""".stripMargin)),

    // ---- the APPLY side shipped: the corpus AFTER keep-first span strip
    // (t24 oracles the stats; this oracles the rewritten text itself, so
    // the flagship rewrite — the thing a curation run actually ships — is
    // DuckDB-verified end to end: keepers byte-identical, foreign words
    // gone, empty-stripped docs surviving as '') ----
    Q("t28_span_rewrite", (s, dir) => {
      import s.implicits._
      // eager span materialization (r22): the lane tolerates the eager
      // step, and the one-pass span set feeds all three rebuild branches.
      // fanOut re-enabled (r22): r21 removed it as a wash when the gram
      // subtree ran per-branch (the exchange amortized over repeats); with
      // the single-window gram pass + eager spans the explode runs ONCE,
      // and the sf1 8-vs-32-core ratio sat at 1.00 — single-task bound.
      Dedup.stripSpansEager(
          Q.fanOut(t(s, dir, "documents"), $"doc_id")
            .select($"doc_id", $"text").as[(Long, String)],
          n = 8)
        .toDF("doc_id", "text")
        .select($"doc_id".cast("long").as("doc_id"), $"text")
        .orderBy($"doc_id")
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, unnest(w) AS wd
        |  FROM words
        |), g8 AS (
        |  SELECT doc_id, pos,
        |    md5(string_agg(wd, ' ') OVER win) AS h,
        |    count(*) OVER win AS cw
        |  FROM tok
        |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
        |), grams AS (
        |  SELECT doc_id, pos, h FROM g8 WHERE cw = 8
        |), firsts AS (
        |  SELECT h, min(doc_id * 1048576 + pos) AS fk
        |  FROM grams GROUP BY 1 HAVING count(*) > 1
        |), fo AS (
        |  SELECT doc_id, pos FROM grams JOIN firsts USING (h)
        |  WHERE doc_id * 1048576 + pos <> fk
        |), isl AS (
        |  SELECT doc_id, pos, sum(CASE WHEN prev IS NULL OR pos - prev > 8
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM fo)
        |), spans AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
        |  FROM isl GROUP BY doc_id, grp
        |), spandocs AS (
        |  SELECT DISTINCT doc_id FROM spans
        |), kept AS (
        |  SELECT t.doc_id, t.pos AS idx, t.wd
        |  FROM tok t JOIN spandocs USING (doc_id)
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = t.doc_id AND t.pos BETWEEN s.s AND s.e)
        |), rebuilt AS (
        |  SELECT doc_id, string_agg(wd, ' ' ORDER BY idx) AS text
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.text AS text
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM spandocs)
        |UNION ALL
        |SELECT CAST(sd.doc_id AS BIGINT) AS doc_id,
        |  COALESCE(r.text, '') AS text
        |FROM spandocs sd LEFT JOIN rebuilt r ON r.doc_id = sd.doc_id
        |ORDER BY doc_id""".stripMargin), bench = true),

    // ---- deterministic per-source downsampling: a doc is kept iff the hex
    // prefix of md5(doc_id) falls under its source's rate threshold — the
    // reproducible alternative to rand() sampling (same keep set on every
    // run, every engine, any partitioning), evaluated as a conditional agg
    // in one pass with no pre-filter scan ----
    Q("t25_hash_sample", (s, dir) => {
      import s.implicits._
      val rate = when($"source" === "src0", "3f")  // ~25%
        .when($"source" === "src1", "7f")          // ~50%
        .otherwise("bf")                           // ~75%
      val keep = substring(md5($"doc_id".cast("string").cast("binary")), 1, 2)
        .leq(rate)
      t(s, dir, "documents")
        .groupBy($"source")
        .agg(count(lit(1)).cast("long").as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).cast("long").as("n_kept"),
          sum(when(keep, $"n_chars").otherwise(0L)).cast("long").as("kept_chars"))
        .orderBy($"source")
    }, Some(
      """SELECT source, CAST(count(*) AS BIGINT) AS n_total,
        | CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM (
        |  SELECT source, n_chars,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
        |      CASE source WHEN 'src0' THEN '3f' WHEN 'src1' THEN '7f'
        |        ELSE 'bf' END AS keep
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- sequence packing: group documents into fixed token-budget bins
    // (the batch-construction pass of LLM pretraining). The scale-correct
    // formulation packs WITHIN hash groups — deterministic doc order and a
    // running token sum per group, bins cut at the budget — so there is no
    // global-order single-partition window; 256 groups pack independently
    // and a bin is globally named (grp, bin). Contiguous greedy semantics:
    // a document lands in the bin its preceding tokens fill ----
    Q("t27_pack", (s, dir) =>
      // hexChars = 2 (256 groups) pins the oracle; PackBinsSpec exercises
      // the 4096-group width the same kernel serves a large cluster with
      packBins(t(s, dir, "documents"), budget = 2000L, hexChars = 2), Some(
      """SELECT grp, CAST((cum - n_toks) // 2000 AS BIGINT) AS bin,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_toks) AS BIGINT) AS sum_tokens
        |FROM (
        |  SELECT grp, n_toks, sum(n_toks) OVER (
        |    PARTITION BY grp ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (
        |    SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS grp,
        |      CASE WHEN trim(text) = '' THEN 0
        |        ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
        |        END AS n_toks
        |    FROM documents))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- context-window chunking: every document splits into fixed-size
    // word chunks with overlap (the training-prep step between curation
    // and tokenization). Pure per-row arithmetic — a narrow generate, no
    // shuffle until the output sort — and each chunk carries the md5 of
    // its joined words so chunk CONTENT (not just boundaries) is
    // cross-engine verified. Starts step by stride while start <=
    // max(1, n - overlap): the final partial chunk is kept, but no chunk
    // that would be pure overlap of the previous one is emitted ----
    Q("t29_chunk", (s, dir) => {
      import s.implicits._
      val chunkWords = 50
      val overlap = 10
      val stride = chunkWords - overlap
      t(s, dir, "documents")
        .select($"doc_id", split(trim($"text"), " ").as("w"))
        .select($"doc_id", $"w", greatest(lit(1),
          (size($"w") - overlap)).as("maxStart"))
        .select($"doc_id", posexplode(expr(
          s"transform(sequence(1, maxStart, $stride), st -> struct(" +
            s"st as start_word, least(st + ${chunkWords - 1}, size(w)) as end_word," +
            s" md5(array_join(slice(w, st, least(st + ${chunkWords - 1}, size(w)) - st + 1), ' ')) as chunk_md5))")))
        .select($"doc_id", ($"pos" + 1).cast("long").as("chunk_idx"),
          $"col.start_word".cast("long").as("start_word"),
          $"col.end_word".cast("long").as("end_word"),
          ($"col.end_word" - $"col.start_word" + 1).cast("long").as("n_tokens"),
          $"col.chunk_md5".as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_idx")
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), starts AS (
        |  SELECT doc_id, w, unnest(range(1, greatest(1, len(w) - 10) + 1, 40)) AS st
        |  FROM words
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) AS BIGINT)
        |    AS chunk_idx,
        |  CAST(st AS BIGINT) AS start_word,
        |  CAST(least(st + 49, len(w)) AS BIGINT) AS end_word,
        |  CAST(least(st + 49, len(w)) - st + 1 AS BIGINT) AS n_tokens,
        |  md5(array_to_string(w[st:least(st + 49, len(w))], ' ')) AS chunk_md5
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- unigram cross-entropy quality score (the perplexity-filter shape
    // of CCNet/Gopher-style curation, with the corpus itself as the LM):
    // corpus word frequencies are a distributed aggregate, the scalar
    // token total rides a one-row broadcast, and each document scores
    // sum(c_dw * ln(N / c_w)) / n_tokens in one join + agg — no vocabulary
    // ever touches the driver. High scores = improbable vocabulary ----
    Q("t30_unigram_nll", (s, dir) => {
      import s.implicits._
      val words = t(s, dir, "documents")
        .select($"doc_id", explode(split(trim($"text"), " ")).as("wd"))
        .filter($"wd" =!= "")
      val cf = words.groupBy($"wd").agg(count(lit(1)).as("cw"))
      val totals = cf.select(sum($"cw").as("n_total"))
      words.groupBy($"doc_id", $"wd").agg(count(lit(1)).as("c"))
        .join(cf, "wd")
        .crossJoin(broadcast(totals))
        .groupBy($"doc_id".cast("long").as("doc_id"))
        .agg(sum($"c").cast("long").as("n_tokens"),
          round(sum($"c" * log($"n_total".cast("double") / $"cw")) / sum($"c"),
            4).as("avg_nll"))
        .orderBy($"doc_id")
    }, Some(
      """WITH wrds AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        |    FROM documents)
        |  WHERE w <> ''
        |), cf AS (
        |  SELECT w, count(*) AS cw FROM wrds GROUP BY 1
        |), n AS (
        |  SELECT sum(cw) AS n_total FROM cf
        |), dc AS (
        |  SELECT doc_id, w, count(*) AS c FROM wrds GROUP BY 1, 2
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(sum(c * ln(CAST(n_total AS DOUBLE) / cw)) / sum(c), 4)
        |    AS avg_nll
        |FROM dc JOIN cf USING (w), n
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- n-gram-overlap decontamination: per corpus document, the
    // fraction of its word-5-grams that appear in the eval set — the
    // overlap-ratio refinement of t18's substring screen. The eval
    // stand-in (docs with doc_id % 97 = 0, CAPPED at the first 200 such
    // ids) is bounded like a real benchmark set regardless of corpus
    // size, so broadcasting its gram digests is legitimate at 100 TB:
    // the corpus side stays one narrow generate + broadcast left join +
    // per-doc agg, never a shuffle of corpus grams ----
    Q("t31_overlap_decon", (s, dir) => {
      import s.implicits._
      val n = 5
      val grams = t(s, dir, "documents")
        .select($"doc_id", split(trim($"text"), " ").as("w"))
        .filter(size($"w") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(w) - ${n - 1})," +
            s" i -> md5(array_join(slice(w, i, $n), ' ')))")).as("h"))
      val evalGrams = grams
        .filter($"doc_id" % 97 === 0 && $"doc_id" < 97L * 200)
        .select($"h").distinct().withColumn("hit", lit(1L))
      grams.filter($"doc_id" % 97 =!= 0)
        .join(broadcast(evalGrams), Seq("h"), "left")
        .groupBy($"doc_id".cast("long").as("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_grams"),
          coalesce(sum($"hit"), lit(0L)).cast("long").as("n_hit"))
        .withColumn("overlap",
          round($"n_hit".cast("double") / $"n_grams", 4))
        .orderBy($"doc_id")
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), grams AS (
        |  SELECT doc_id, md5(array_to_string(w[pos:pos+4], ' ')) AS h
        |  FROM (SELECT doc_id, unnest(range(1, len(w) - 3)) AS pos, w
        |        FROM words WHERE len(w) >= 5)
        |), ev AS (
        |  SELECT DISTINCT h FROM grams
        |  WHERE doc_id % 97 = 0 AND doc_id < 97 * 200
        |)
        |SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(ev.h) AS BIGINT) AS n_hit,
        |  round(CAST(count(ev.h) AS DOUBLE) / count(*), 4) AS overlap
        |FROM grams g LEFT JOIN ev ON g.h = ev.h
        |WHERE g.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- PII detection + redaction (the scrubbing pass of a training
    // pipeline): per-doc email/IPv4/phone counts and the md5 of the
    // scrubbed text, so redacted CONTENT (not just counts) is verified
    // cross-engine. The synthetic corpus carries no PII, so a
    // deterministic contact line derived from (doc_id, source) is planted
    // first — identically in both engines — to exercise the kernel; the
    // patterns are an RE2-safe subset so Java regex and RE2 agree match
    // for match. Pure per-row projection over codegen'd built-ins
    // (regexp_count/regexp_replace): narrow, no shuffle but the sort ----
    Q("t32_pii_redact", (s, dir) => {
      import s.implicits._
      val d = $"doc_id"
      val planted = concat($"text", when(d % 4 === 0,
          concat(lit(" contact user"), d.cast("string"), lit("@"), $"source",
            lit(".com ip 10."), (d % 256).cast("string"), lit(".0."),
            ((d * 7) % 256).cast("string"), lit(" tel 555-"),
            lpad((d % 10000).cast("string"), 4, "0")))
        .when(d % 4 === 1,
          concat(lit(" mail user"), d.cast("string"), lit("@"), $"source",
            lit(".org")))
        .when(d % 4 === 2,
          concat(lit(" host 192.168."), (d % 256).cast("string"), lit("."),
            ((d * 3) % 256).cast("string")))
        .otherwise(lit("")))
      t(s, dir, "documents")
        .select(d.cast("long").as("doc_id"), planted.as("t"))
        .select($"doc_id",
          regexp_count($"t", lit(EmailRe)).cast("long").as("n_email"),
          regexp_count($"t", lit(IpRe)).cast("long").as("n_ip"),
          regexp_count($"t", lit(PhoneRe)).cast("long").as("n_phone"),
          md5(redactPii($"t")).as("red_md5"))
        .orderBy($"doc_id")
    }, Some(
      """WITH p AS (
        |  SELECT doc_id, text || CASE
        |    WHEN doc_id % 4 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@' || source || '.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        |      || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    WHEN doc_id % 4 = 1 THEN ' mail user' || CAST(doc_id AS VARCHAR)
        |      || '@' || source || '.org'
        |    WHEN doc_id % 4 = 2 THEN ' host 192.168.'
        |      || CAST(doc_id % 256 AS VARCHAR) || '.'
        |      || CAST((doc_id * 3) % 256 AS VARCHAR)
        |    ELSE '' END AS t
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(t,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(t, '\b555-\d{4}\b')) AS BIGINT)
        |    AS n_phone,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b555-\d{4}\b', '<PHONE>', 'g')) AS red_md5
        |FROM p ORDER BY 1""".stripMargin)),

    // ---- training-mixture allocation (the domain-weighting step of a
    // data recipe): per-source token totals -> temperature-flattened
    // weights (alpha = 0.5 via floor(sqrt(tokens)), integer so the split
    // is engine-independent) -> an exact rational round-half-up share of
    // a token budget, plus the implied epochs-over-source rate. One tiny
    // groupBy (|sources| rows) + a one-row broadcast total: nothing here
    // grows with the corpus except the first scan ----
    Q("t33_mixture_weights", (s, dir) =>
      mixtureWeights(t(s, dir, "documents"), budget = 100000L), Some(
      """WITH src AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(CASE WHEN trim(text) = '' THEN 0
        |      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
        |      END) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT source, n_docs, n_tokens,
        |    CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) AS wt
        |  FROM src
        |), tw AS (SELECT sum(wt) AS tw FROM w),
        |alloc AS (
        |  SELECT source, n_docs, n_tokens, wt,
        |    CAST((200000 * wt + tw) // (2 * tw) AS BIGINT) AS alloc_tokens
        |  FROM w, tw
        |)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens, wt, alloc_tokens,
        |  CASE WHEN n_tokens = 0 THEN 0.0
        |    ELSE round(CAST(alloc_tokens AS DOUBLE) / n_tokens, 4) END AS epochs
        |FROM alloc ORDER BY source""".stripMargin)),

    // ---- Bloom-prefiltered exact decontamination: the eval set's
    // word-5-grams fold into a 2^20-bit Bloom filter (native bloom_agg,
    // word-wise-OR merge so map-side partials apply); the collected
    // 128 KiB bitset rides the plan as a literal and the codegen'd
    // bloom_contains prunes corpus grams BEFORE the confirm join, which
    // re-checks survivors exactly (md5 digests). Bloom filters have no
    // false negatives, so the output is exactly the plain-join answer —
    // the oracle IS that plain join; the bloom is purely physical.
    // This is the 100 TB shape for blocklists too big to broadcast as a
    // hash relation: ~1.2 bytes/key prefilters locally with no shuffle,
    // and only the (true hits + ~1e-5 fp) sliver reaches the join. Gram
    // totals come from size(w) arithmetic — the count never explodes ----
    Q("t34_bloom_decon", (s, dir) => {
      import s.implicits._
      // fanned scan (r22): the sf1 lens measured the lane serial (8-vs-32
      // ratio 0.98) — the corpus gram explode + hash kernel ran on the
      // single-row-group file's one task; r21's removal was A/B'd only at
      // overhead-bound sf0.1
      val docs = Q.fanOut(t(s, dir, "documents"), $"doc_id")
      bloomDecon(
        corpus = docs.filter($"doc_id" % 97 =!= 0),
        evalDocs = docs.filter($"doc_id" % 97 === 0 && $"doc_id" < 97L * 200))
    }, Some(
      """WITH words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), grams AS (
        |  SELECT doc_id, array_to_string(w[pos:pos+4], ' ') AS g
        |  FROM (SELECT doc_id, unnest(range(1, len(w) - 3)) AS pos, w
        |        FROM words WHERE len(w) >= 5)
        |), ev AS (
        |  SELECT DISTINCT g FROM grams
        |  WHERE doc_id % 97 = 0 AND doc_id < 97 * 200
        |)
        |SELECT CAST(gr.doc_id AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(ev.g) AS BIGINT) AS n_contam,
        |  count(ev.g) = 0 AS keep
        |FROM grams gr LEFT JOIN ev ON gr.g = ev.g
        |WHERE gr.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin), bench = true),

    // ---- Unicode canonicalization: NFC-compose (native codegen'd
    // NfcNormalize — Spark ships no normalizer built-in), lowercase, strip
    // punctuation to spaces, collapse runs — the canonical form hashed for
    // cross-encoding dedup. Docs with doc_id % 7 == 0 get a deterministic
    // DECOMPOSED accent injected (e + U+0301) so composition is actually
    // exercised, not vacuously true on ASCII: nfc_len < raw_len for them,
    // and canon_md5 only matches the oracle if both engines composed to
    // the identical codepoints before hashing. Pure per-row column exprs ----
    Q("t35_normalize", (s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val dirty = when($"doc_id" % 7 === 0,
        regexp_replace($"text", "e", "e\u0301")).otherwise($"text")
      val norm = lower(call_function("nfc_normalize", dirty))
      val canon = trim(regexp_replace(
        regexp_replace(norm, "[^\\p{L}\\p{N} ]", " "), " +", " "))
      t(s, dir, "documents")
        .select($"doc_id".cast("long").as("doc_id"),
          length(dirty).cast("long").as("raw_len"),
          length(norm).cast("long").as("nfc_len"),
          md5(canon.cast("binary")).as("canon_md5"))
        .orderBy($"doc_id")
    }, Some(
      """WITH dirty AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |    THEN replace(text, 'e', 'e' || chr(769)) ELSE text END AS t
        |  FROM documents
        |), norm AS (
        |  SELECT doc_id, length(t) AS raw_len, lower(nfc_normalize(t)) AS n
        |  FROM dirty
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(raw_len AS BIGINT) AS raw_len,
        |  CAST(length(n) AS BIGINT) AS nfc_len,
        |  md5(trim(regexp_replace(regexp_replace(n,
        |    '[^\p{L}\p{N} ]', ' ', 'g'), ' +', ' ', 'g'))) AS canon_md5
        |FROM norm ORDER BY doc_id""".stripMargin)),

    // ---- temperature sampling: materialize the t33 mixture weights into
    // the kept corpus via per-source deterministic hash thresholds (see
    // [[temperatureSample]]) — rollup per source so every per-doc keep
    // decision is sum-verified ----
    Q("t36_temperature_sample", (s, dir) =>
      temperatureSample(t(s, dir, "documents"), budget = 100000L), Some(
      """WITH src AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(CASE WHEN trim(text) = '' THEN 0
        |      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
        |      END) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) AS wt
        |  FROM src
        |), tw AS (SELECT sum(wt) AS tw FROM w),
        |alloc AS (
        |  SELECT source, n_tokens AS src_tokens,
        |    CAST((200000 * wt + tw) // (2 * tw) AS BIGINT) AS alloc_tokens
        |  FROM w, tw
        |), k AS (
        |  SELECT d.source,
        |    least(1.0, alloc_tokens::DOUBLE / src_tokens) AS p,
        |    alloc_tokens >= src_tokens
        |      OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
        |        lpad(lower(hex(CAST(floor(least(1.0,
        |          alloc_tokens::DOUBLE / src_tokens) * 4294967296.0)
        |          AS BIGINT))), 8, '0') AS keep,
        |    CASE WHEN trim(d.text) = '' THEN 0
        |      ELSE length(trim(d.text)) - length(replace(trim(d.text), ' ', '')) + 1
        |      END AS n_toks
        |  FROM documents d JOIN alloc a USING (source)
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN keep THEN n_toks ELSE 0 END) AS BIGINT)
        |    AS kept_tokens,
        |  round(max(p), 4) AS target_frac
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
