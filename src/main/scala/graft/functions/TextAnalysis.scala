package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID, winnowing
  * fingerprints. Kernels are pure functions invoked from typed maps or
  * codegen'd SQL expressions — no Python, no driver loops.
  */
object TextAnalysis {

  // ---------------- hashing kernels (executor-local) ----------------

  /** 64-bit avalanche hash (splitmix64 finalizer) — stable across JVMs. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stable 64-bit string hash (FNV-1a over UTF-16 code units + avalanche). */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** FNV-1a + avalanche over a UTF8String's raw bytes — the zero-copy
    * token hash of the span-dedup gram kernel ([[gramDigests]]). Byte-level
    * (vs [[hashString]]'s UTF-16 code units — the two COINCIDE on pure
    * ASCII, where code units equal bytes, and diverge on anything else);
    * batch and streaming digests never join on each other, and the
    * streaming lane additionally runs distinct chain seeds
    * ([[StreamSeedA]]), so the surfaces cannot be conflated even on ASCII
    * corpora. */
  def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val nb = s.numBytes()
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < nb) {
      h ^= (s.getByte(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** One gram-digest chain: fold mix64(acc ^ tokenHash) over n consecutive
    * token hashes from `off`. The chain distinguishes token SEQUENCES (not
    * concatenations), so it is a drop-in identity for word n-grams. Shared
    * by the batch span-dedup digests ([[gramDigests]]) and the streaming
    * suppressor's state key
    * ([[graft.streaming.StreamingDedup.spanForeignMarks]]). */
  @inline def gramChain(th: Array[Long], off: Int, n: Int, seed: Long): Long = {
    var acc = seed
    var j = 0
    while (j < n) { acc = mix64(acc ^ th(off + j)); j += 1 }
    acc
  }

  /** Chain seeds for the two independent digest lanes. */
  val GramSeedA = 0x9e3779b97f4a7c15L
  val GramSeedB = 0xc2b2ae3d27d4eb4fL
  /** Streaming-suppressor chain seeds — deliberately DISTINCT from the
    * batch seeds so streaming state keys never coincide with batch
    * digests, even on ASCII corpora where [[hashUtf8]] and [[hashString]]
    * agree per token. */
  val StreamSeedA: Long = mix64(GramSeedA ^ 0x53L)
  val StreamSeedB: Long = mix64(GramSeedB ^ 0x53L)
  /** Second-lane token-hash tweak (lane B re-mixes every token hash, so
    * the lanes differ in both token hashes AND seed). */
  val GramTokenTweak = 0x5851f42d4c957f2dL
  /** Token hash for a null array element on the SQL surface of
    * [[gramDigests]] — a fixed sentinel so the function is total (the
    * internal span-dedup caller never produces nulls: split() cannot). */
  val NullTokenHash: Long = mix64(0x6e756c6cL) // "null"

  /** Per-position word-n-gram digests of a tokenized document, as TWO
    * independent 64-bit chains (struct h1, h2 — effectively a 128-bit
    * identity, so grouping on the digest is collision-safe at corpus
    * scale: ~10^-15 expected collisions across 10^12 grams, where one
    * 64-bit lane alone would produce thousands and silently rewrite
    * non-duplicated text). Position i
    * (0-based) covers tokens [i, i+n); callers filter docs with fewer
    * than n tokens.
    *
    * This replaces the md5(array_join(slice(w, i, n))) formulation: that
    * built an O(gram-length) STRING per position and pushed a 32-char hex
    * key into the shuffle — measured at sf0.1, the string building + md5
    * was ~70% of the whole duplicated-position stage. Here each token
    * hashes ONCE (FNV over its UTF8 bytes) and each position folds n
    * longs, with a 16-byte shuffle key. */
  def gramDigests(words: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val w = words.numElements()
    val cnt = w - n + 1
    if (cnt <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val t1 = new Array[Long](w)
    val t2 = new Array[Long](w)
    var i = 0
    while (i < w) {
      // the internal caller's split() never yields null elements, but the
      // registered SQL function accepts arbitrary arrays — a null element
      // hashes to a fixed sentinel instead of NPEing the query
      val s = words.getUTF8String(i)
      val h = if (s == null) NullTokenHash else hashUtf8(s)
      t1(i) = h
      t2(i) = mix64(h ^ GramTokenTweak)
      i += 1
    }
    val out = new Array[Any](cnt)
    i = 0
    while (i < cnt) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](gramChain(t1, i, n, GramSeedA),
          gramChain(t2, i, n, GramSeedB)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Whitespace tokens. */
  def tokenize(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  /** Hashed word n-gram shingles (the unit of MinHash/Jaccard dedup). */
  def shingles(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty else Array(hashString(toks.mkString(" ")))
    } else
      (0 to toks.length - n).map(i => hashString(toks.slice(i, i + n).mkString(" "))).toArray
  }

  /** Distinct shingles, sorted (set representation). */
  def shingleSet(text: String, n: Int): Array[Long] = {
    val a = shingles(text, n).distinct
    java.util.Arrays.sort(a)
    a
  }

  /** Feature-hashed document embedding (the hashing trick, Weinberger et
    * al. 2009): each whitespace token hashes (FNV-1a + mix64, the same
    * [[hashString]] every dedup kernel uses) to a bucket `floorMod(h,
    * dim)` with sign from the hash's top bit (the signed variant keeps
    * E[dot] of unrelated docs at 0), token counts accumulate, and the
    * vector L2-normalizes. A model-free bridge from the text pillar to
    * the embedding pillar — the output feeds cosine dedup / ANN directly
    * — and deterministic integer-through-IEEE arithmetic end to end, so
    * the lane carries a full DuckDB oracle (t38). Empty/whitespace docs
    * return the zero vector. */
  def hashedEmbedding(text: String, dim: Int): Array[Float] = {
    val v = new Array[Double](dim)
    for (tok <- tokenize(text)) {
      val h = hashString(tok)
      val b = ((h % dim) + dim) % dim
      v(b.toInt) += (if (h < 0) -1.0 else 1.0)
    }
    var n2 = 0.0
    var i = 0
    while (i < dim) { n2 += v(i) * v(i); i += 1 }
    if (n2 == 0.0) new Array[Float](dim)
    else {
      val n = math.sqrt(n2)
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  // ---------------- quality scoring ----------------

  /** Heuristic quality metrics as SQL columns (codegen'd, no UDF):
    * token count, mean word length, alpha ratio, punctuation ratio,
    * uppercase ratio, digit ratio. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val tr = trim(text)
    val len = length(text).cast("double")
    val noSpace = length(regexp_replace(tr, "\\s+", ""))
    val tokens = when(tr === "", 0)
      .otherwise(size(split(tr, "\\s+"))).cast("long")
    Seq(
      "n_tokens" -> tokens,
      "avg_word_len" -> (noSpace.cast("double") / greatest(tokens, lit(1L))),
      "alpha_ratio" -> (length(regexp_replace(text, "[^A-Za-z]", "")) / greatest(len, lit(1.0))),
      "punct_ratio" -> (length(regexp_replace(text, "[^.,;:!?'\"()]", "")) / greatest(len, lit(1.0))),
      "upper_ratio" -> (length(regexp_replace(text, "[^A-Z]", "")) / greatest(len, lit(1.0))),
      "digit_ratio" -> (length(regexp_replace(text, "[^0-9]", "")) / greatest(len, lit(1.0))))
  }

  /** Attach quality metric columns to a DataFrame. */
  def withQuality(df: DataFrame, textCol: String): DataFrame =
    qualityColumns(col(textCol)).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }

  // ---------------- language identification ----------------

  /** Stopword profiles (public common-word lists). A real deployment would
    * plug a trained char-n-gram model; the operator shape (score map,
    * argmax) is what matters at 100 TB. */
  private[graft] val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "of", "and", "to", "in", "is", "that", "it", "was",
      "for", "with", "as", "on", "at", "by"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "que", "un",
      "une", "dans", "pour", "pas", "sur", "avec"),
    "es" -> Set("el", "la", "los", "de", "que", "y", "es", "en", "un", "una",
      "del", "las", "por", "con", "para"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "zu", "den",
      "nicht", "ein", "eine", "mit", "auf", "sich", "auch"),
    "it" -> Set("il", "di", "che", "e", "la", "per", "non", "sono", "con",
      "del", "una", "gli", "nel", "anche", "come"),
    "pt" -> Set("o", "de", "a", "e", "do", "da", "em", "um", "para", "com",
      "uma", "os", "no", "na", "por"),
    "nl" -> Set("de", "het", "een", "van", "en", "in", "is", "dat", "op",
      "te", "zijn", "met", "voor", "niet", "aan"))

  /** Script-first heuristic language-ID: when one non-Latin Unicode script
    * dominates the letters, the script decides (Kana ⇒ ja even among Han —
    * Japanese mixes scripts); otherwise tokenized stopword vote over the
    * Latin profiles, tie-broken deterministically; "und" when no evidence. */
  def detectLanguage(text: String): String = {
    if (text.isEmpty) return "und"
    // codepoint counts per script bucket
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var arab = 0
    var deva = 0; var greek = 0; var hebrew = 0; var thai = 0; var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i).toInt
      if (Character.isLetter(c)) {
        letters += 1
        if (c >= 0x4e00 && c <= 0x9fff) han += 1
        else if (c >= 0x3040 && c <= 0x30ff) kana += 1
        else if (c >= 0xac00 && c <= 0xd7af) hangul += 1
        else if (c >= 0x0400 && c <= 0x04ff) cyr += 1
        else if (c >= 0x0600 && c <= 0x06ff) arab += 1
        else if (c >= 0x0900 && c <= 0x097f) deva += 1
        else if (c >= 0x0370 && c <= 0x03ff) greek += 1
        else if (c >= 0x0590 && c <= 0x05ff) hebrew += 1
        else if (c >= 0x0e00 && c <= 0x0e7f) thai += 1
      }
      i += 1
    }
    if (letters > 0) {
      // Japanese mixes Han with Kana: any kana alongside han decides ja
      // (e.g. Han nouns joined by a single の), as does kana-dominant text
      // with >= 2 kana — the floor keeps one stray kana (an emoticon in
      // Latin text) from hijacking the vote
      if ((kana >= 1 && han >= 1) || (kana >= 2 && kana * 10 > letters))
        return "ja"
      val dominant = Seq(han -> "zh", hangul -> "ko", cyr -> "ru",
        arab -> "ar", deva -> "hi", greek -> "el", hebrew -> "he",
        thai -> "th").maxBy(_._1)
      if (dominant._1 * 3 > letters) return dominant._2
    }
    val toks = tokenize(text.toLowerCase)
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestScore = 0
    // sorted iteration + strict > : deterministic lexicographic tie-break
    for (lang <- stopwords.keys.toSeq.sorted) {
      val score = toks.count(stopwords(lang).contains)
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  // ---------------- document fingerprinting (winnowing) ----------------

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): rolling
    * Karp-Rabin over character k-grams, window minimum with rightmost-tie
    * rule; robust to small edits. Returns distinct fingerprint hashes. */
  def winnowingFingerprints(text: String, kGram: Int = 8, window: Int = 4): Array[Long] = {
    val L = text.length
    if (L < kGram) return if (L == 0) Array.empty else Array(hashString(text))
    val n = L - kGram + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      // simple polynomial rolling would need modular bookkeeping; string
      // hashing each k-gram is O(k) but k is tiny and this stays local
      hashes(i) = hashString(text.substring(i, i + kGram))
      i += 1
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var w = 0
    val last = n - window
    while (w <= math.max(0, last)) {
      var minIdx = w
      var j = w + 1
      val end = math.min(w + window, n)
      while (j < end) {
        if (java.lang.Long.compareUnsigned(hashes(j), hashes(minIdx)) <= 0) minIdx = j
        j += 1
      }
      out += hashes(minIdx)
      w += 1
    }
    out.toArray
  }

  /** BPE-ish token estimate: words + punctuation clusters + digit runs
    * (a cheap, deterministic stand-in for a real tokenizer's count). */
  def tokenEstimate(text: String): Long = {
    val matcher = java.util.regex.Pattern
      .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]").matcher(text)
    var n = 0L
    while (matcher.find()) {
      val t = matcher.group()
      // long words cost extra "subword" tokens, ~5 chars each
      n += (if (t.head.isLetter) 1 + (t.length - 1) / 5 else 1)
    }
    n
  }
}
