package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import Q.t

/** Harness entries for the non-SQL-expressible training-data operators
  * (MinHash LSH, SimHash, n-gram Jaccard, language-ID, fingerprinting,
  * token estimation, ANN). These get rows-only driver checks; their
  * correctness (e.g. LSH recall vs exact Jaccard) is asserted in ScalaTest.
  */
object PipelineQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "documents").select($"doc_id", $"text").as[(Long, String)]
  }

  private def vecs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "embeddings").select($"vec_id", $"embedding").as[(Long, Array[Float])]
  }

  val queries: Seq[Q] = Seq(
    Q("t06_minhash_lsh", (s, dir) => {
      import s.implicits._
      Dedup.minhashDedup(docs(s, dir), shingleN = 3, numHashes = 64,
        bands = 16, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }, None, bench = true),

    Q("t07_ngram_jaccard", (s, dir) => {
      import s.implicits._
      Dedup.ngramJaccardPairs(docs(s, dir), shingleN = 3, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }, Some(
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
        |ORDER BY id_a, id_b""".stripMargin)),

    Q("t08_simhash", (s, dir) => {
      import s.implicits._
      Dedup.simhashDedup(docs(s, dir), shingleN = 3, maxDist = 6)
        .orderBy($"id_a", $"id_b")
    }, None),

    Q("t09_langid", (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .map { case (id, text) => (id, TextAnalysis.detectLanguage(text)) }
        .toDF("doc_id", "lang_detected")
        .groupBy($"lang_detected").agg(count(lit(1)).as("cnt"))
        .orderBy($"lang_detected")
    }, None),

    Q("t10_fingerprints", (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .map { case (id, text) =>
          (id, TextAnalysis.winnowingFingerprints(text).length)
        }
        .toDF("doc_id", "n_fingerprints")
        .orderBy($"doc_id")
    }, None),

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

    Q("t13_dedup_decisions", (s, dir) => {
      import s.implicits._
      Dedup.dedupDecisions(docs(s, dir), threshold = 0.5)
        .select($"id".cast("long").as("id"), $"cluster".cast("long").as("cluster"),
          $"keep")
        .orderBy($"id")
    }, None),

    Q("v06_ivf_knn", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.ivfKnn(v.filter(_._1 < 20), v, k = 3, nCells = 8, nProbe = 3)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, None),

    // group-level MinHash sketches via the native aggregate: per-source
    // corpus signatures -> pairwise estimated Jaccard between sources.
    // Fully distributed: signatures posexplode to (idx, val) and sources
    // whose sketches agree at a position meet in an equi-join, so the
    // estimate (= fraction of matching positions) never touches the driver
    // and pairs with zero sketch overlap are never materialized — at 10^5+
    // sources a driver-side O(n^2) loop would be the job's bottleneck.
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
    }, None),

    // int8-quantized exact kNN: the corpus scans as (scale, codes) at 1/4
    // the bytes of float32; no re-rank needed (error ~ quantization noise)
    Q("v08_int8_knn", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.int8Knn(v.filter(_._1 < 20), v, k = 3)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, None),

    // PQ ANN: 8-byte codes scanned instead of 64-dim float vectors, bounded
    // per-partition candidate heaps, exact re-rank of survivors only
    Q("v07_pq_knn", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.pqKnn(v.filter(_._1 < 20), v, k = 3, subspaces = 8,
        centroids = 16, rerank = 24)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, None, bench = true),

    Q("v04_knn_lsh", (s, dir) => {
      import s.implicits._
      val v = vecs(s, dir)
      Similarity.lshKnn(v.filter(_._1 < 20), v, k = 3, planes = 10)
        .select($"qid".cast("long").as("qid"), $"nid".cast("long").as("nid"),
          round($"sim", 6).as("sim"))
        .orderBy($"qid", $"sim".desc, $"nid")
    }, None, bench = true),

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
    }, None),

    Q("v05_cosine_dedup", (s, dir) => {
      import s.implicits._
      // random 64-dim embeddings rarely exceed ~0.3 cosine; 0.25 keeps the
      // check non-vacuous while still exercising the bucketed-pairs path
      Similarity.cosineDedup(vecs(s, dir), threshold = 0.25, planes = 10)
        .select($"id_a".cast("long").as("id_a"), $"id_b".cast("long").as("id_b"),
          round($"sim", 6).as("sim"))
        .orderBy($"id_a", $"id_b")
    }, None)
  )
}
