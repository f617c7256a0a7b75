package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming corpus curation — the online half of the batch dedup/quality
  * operators in [[graft.operators.Dedup]] / [[graft.functions.TextAnalysis]]:
  * documents arrive as a stream and are deduplicated / scored incrementally.
  *
  * Scale design: exact dedup keys state by a 128-bit content hash and uses
  * `dropDuplicatesWithinWatermark`, so per-key state is dropped once the
  * event-time watermark passes it — state is bounded by (arrival rate x
  * watermark delay), never by corpus size. The quality filter is stateless.
  * Near-dup suppression keeps one state entry per LSH band bucket, and the
  * per-batch survivor fold is distributed: only the small residual class of
  * in-batch-conflicting docs reaches the driver, as id/ts/bucket triples
  * with no document text (see [[foldBatch]]).
  */
object StreamingDedup {

  /** Exact streaming dedup on content: keeps the first arrival of each
    * distinct text, with state bounded by the watermark delay (duplicates
    * arriving later than `watermark` after the original may pass — the
    * standard bounded-state tradeoff). `tsCol` must be an event-time
    * timestamp column. */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    docs
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** Event heading into the per-band-bucket ownership state machine: either
    * a document's band row (`kind=Data`; `text` rides on ONE designated row
    * per doc, null elsewhere, so payloads do not amplify by the band count
    * through the stateful shuffle) or an ownership correction fed back from
    * a completed micro-batch fold (`kind=Reassign` with `docId` = the new
    * owner, or `kind=Release`). */
  final case class BandEvent(bandKey: Long, docId: Long,
      ts: java.sql.Timestamp, text: String, kind: Int)
  object BandEvent {
    val Data = 0
    val Reassign = 1
    val Release = 2
  }

  /** Band row annotated with the bucket's owning doc. `priorOwner` is true
    * when the owner was recorded in an EARLIER trigger — such an owner can
    * never be part of the current micro-batch, which is what lets the
    * survivor fold classify most docs distributively. */
  final case class OwnedRow(docId: Long, ts: java.sql.Timestamp, bandKey: Long,
      ownerDocId: Long, priorOwner: Boolean, text: String)

  /** Ownership correction emitted by [[foldBatch]] for a bucket whose
    * recorded in-batch owner did NOT survive the fold: `newOwner >= 0`
    * reassigns the bucket to the doc that survived it, `newOwner ==
    * ReleaseOwner` releases the bucket so the next arrival starts fresh.
    * Routing these back into the query's feedback stream (a log/queue topic
    * in production, a MemoryStream in tests — see [[dedupNearWithFeedback]])
    * closes the residual suppression window after ONE trigger instead of
    * leaving a dead doc's buckets suppressing look-alikes until the TTL. */
  final case class Feedback(bandKey: Long, newOwner: Long,
      ts: java.sql.Timestamp)
  val ReleaseOwner: Long = -1L

  /** The default near-dup candidate test: shingle → minhash → LSH band keys,
    * the SAME kernel as the batch path
    * ([[graft.operators.Dedup.minhashDedup]]), so online and offline
    * suppression agree. */
  def lshKeyer(shingleN: Int, numHashes: Int, bands: Int)
      : String => Array[Long] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    text => graft.operators.Dedup.bandKeys(
      graft.operators.Dedup.minhashSignature(
        graft.functions.TextAnalysis.shingleSet(text, shingleN), numHashes),
      bands)
  }

  /** Streaming NEAR-dup suppression, phase 1: per band bucket, record the
    * owning document (earliest (ts, docId) arrival, event-time expired) —
    * the online analogue of [[graft.operators.Dedup.minhashDedup]]'s
    * candidate blocking.
    *
    * Scale/correctness design: one state entry per band bucket (the owner
    * doc id), never pairwise state. Docs with no shingles get a synthetic
    * self-owned bucket (mirroring the batch rule that empty docs are never
    * candidates), and null text/ts rows are dropped rather than crashing
    * the query. Band matching is the LSH candidate test, so false-positive
    * drops happen at the usual LSH rate for (numHashes, bands); exact
    * verification would need a batch pass — streams cannot re-read earlier
    * documents.
    *
    * `feedback`, when given, is a second streaming source of [[Feedback]]
    * corrections (produced by [[foldBatch]] on the previous trigger) that is
    * unioned into the state input; corrections apply BEFORE the same
    * trigger's data rows, so a bucket freed by its dead owner stops
    * suppressing after exactly one trigger. `keyer` overrides the LSH
    * candidate test (None → [[lshKeyer]]). */
  def dedupNearOwnership(docs: DataFrame, textCol: String, tsCol: String,
      idCol: String, watermark: String = "10 minutes", shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      stateTtlMs: Long = 10 * 60 * 1000L,
      feedback: Option[Dataset[Feedback]] = None,
      keyer: Option[String => Array[Long]] = None)
      : Dataset[OwnedRow] = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    val spark = docs.sparkSession
    import spark.implicits._

    val keyFn = keyer.getOrElse(lshKeyer(shingleN, numHashes, bands))
    val bandRows = docs
      .filter(col(textCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col(textCol).as("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .flatMap { case (docId, ts, text) =>
        val keys = keyFn(text)
        if (keys.isEmpty)
          // no shingles: a synthetic per-doc bucket the doc trivially owns
          // (batch parity: empty docs never become near-dup candidates)
          Iterator.single(BandEvent(
            graft.functions.TextAnalysis.mix64(docId ^ 0x5ee7a11dL), docId,
            ts, text, BandEvent.Data))
        else
          keys.iterator.zipWithIndex.map { case (k, i) =>
            BandEvent(k, docId, ts, if (i == 0) text else null, BandEvent.Data)
          }
      }
    val events = feedback match {
      case Some(fb) => bandRows.union(fb.map(f => BandEvent(f.bandKey,
        f.newOwner, f.ts, null,
        if (f.newOwner >= 0) BandEvent.Reassign else BandEvent.Release)))
      case None => bandRows
    }
    ownershipStream(events, watermark, stateTtlMs)
  }

  /** The per-band-bucket ownership state machine over an already-keyed
    * event stream — shared by the text path ([[dedupNearOwnership]]) and
    * the embedding path ([[dedupNearEmbedding]]); one Long of state per
    * bucket, event-time expired. */
  private def ownershipStream(events: Dataset[BandEvent], watermark: String,
      stateTtlMs: Long): Dataset[OwnedRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def assignOwner(bandKey: Long, rows: Iterator[BandEvent],
        state: GroupState[Long]): Iterator[OwnedRow] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val rs = rows.toVector
      // fold corrections from the PREVIOUS trigger first, so this trigger's
      // data already sees the corrected ownership
      for (f <- rs.filter(_.kind != BandEvent.Data).sortBy(_.ts.getTime))
        f.kind match {
          case BandEvent.Reassign => state.update(f.docId)
          case _                  => if (state.exists) state.remove()
        }
      val data = rs.filter(_.kind == BandEvent.Data)
        .sortBy(r => (r.ts.getTime, r.docId))
      val out: Iterator[OwnedRow] =
        if (data.isEmpty) Iterator.empty
        else {
          val prior = state.exists
          val owner = state.getOption.getOrElse(data.head.docId)
          if (!prior) state.update(owner)
          data.iterator.map(r =>
            OwnedRow(r.docId, r.ts, r.bandKey, owner, prior, r.text))
        }
      // expire the bucket once the watermark passes arrival + TTL (the
      // timeout must stay ahead of the current watermark or Spark rejects it)
      if (state.exists)
        state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs() + 1,
          rs.map(_.ts.getTime).max + stateTtlMs))
      out
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.bandKey)
      .flatMapGroupsWithState[Long, OwnedRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(assignOwner)
  }

  /** One micro-batch's survivor fold. `survivors`/`feedback` are lazy
    * distributed frames over the persisted batch — consume them, then call
    * `cleanup()`. `residualDocs` of `totalDocs()` reached the driver
    * greedy. `totalDocs` is a THUNK (r22): it runs its own count job over
    * the persisted batch, and the production sinks ([[dedupNear]], the
    * bench lane) never read it — per-trigger latency should not pay a job
    * for a diagnostic only tests and monitoring consume. Call it before
    * `cleanup()`. */
  final case class BatchFold(survivors: DataFrame, feedback: Dataset[Feedback],
      totalDocs: () => Long, residualDocs: Long, cleanup: () => Unit)

  /** Distributed survivor fold over one micro-batch of [[OwnedRow]]s.
    *
    * The sequential greedy (process docs in arrival order; a doc survives
    * iff none of its buckets is already claimed; survivors claim their
    * buckets, buckets owned by earlier batches are claimed upfront)
    * decomposes into three distributive classes plus a small residual:
    *
    *  1. DEAD: any bucket with `priorOwner` — claimed upfront, the doc can
    *     never survive.
    *  2. ALIVE: no prior bucket and every bucket self-owned — the doc is the
    *     earliest arrival in all its buckets, so no earlier doc can have
    *     claimed any of them.
    *  3. DEAD: a bucket owned by a class-2 doc — class-2 docs always survive
    *     and always claim, and (being bucket owners) arrive earlier.
    *  4. RESIDUAL: everything else — docs whose conflicts are only with
    *     other non-surviving or residual docs. Only these need the
    *     order-sensitive greedy, and only their (docId, ts, bandKey) triples
    *     are collected — NO document text reaches the driver, and in a
    *     steady stream the class is a small fraction of the batch (unique
    *     docs are class 2, duplicates of earlier batches are class 1).
    *
    * Survivor text is re-joined distributively from the batch's designated
    * text rows. `feedback` holds the ownership corrections for buckets whose
    * in-batch owner died (reassign to the surviving toucher, else release);
    * route it back via [[dedupNearWithFeedback]] to close the residual
    * suppression window after one trigger. */
  def foldBatch(batch: Dataset[OwnedRow], idCol: String = "docId",
      tsCol: String = "ts", textCol: String = "text"): BatchFold = {
    val spark = batch.sparkSession
    import spark.implicits._
    val rows = batch.persist()
    val perDoc = rows.groupBy("docId").agg(
      max(when(col("priorOwner"), 1).otherwise(0)).as("any_prior"),
      min(when(col("ownerDocId") === col("docId"), 1).otherwise(0))
        .as("all_self"))
    val aliveB = perDoc
      .filter(col("any_prior") === 0 && col("all_self") === 1).select("docId")
    val residual0 = perDoc
      .filter(col("any_prior") === 0 && col("all_self") === 0).select("docId")
    val residualRows0 = rows.join(residual0, Seq("docId"), "left_semi")
    val deadByAlive = residualRows0
      .join(aliveB.withColumnRenamed("docId", "ownerDocId"),
        Seq("ownerDocId"), "left_semi")
      .select("docId").distinct()
    // the residual class — the ONLY rows collected, and without text
    val residual = residualRows0.join(deadByAlive, Seq("docId"), "left_anti")
      .select(col("docId"), col("ts"), col("bandKey"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
    val claimed = collection.mutable.Set.empty[Long]
    val greedyIds = collection.mutable.ArrayBuffer.empty[Long]
    for ((id, rs) <- residual.groupBy(_._1).toSeq
           .sortBy { case (id, rs) => (rs.head._2.getTime, id) })
      if (rs.forall(r => !claimed.contains(r._3))) {
        greedyIds += id
        rs.foreach(r => claimed += r._3)
      }
    val survivorIds = aliveB
      .union(spark.createDataset(greedyIds.toSeq).toDF("docId")).persist()
    val survivors = rows.filter(col("text").isNotNull)
      .join(survivorIds, Seq("docId"), "left_semi")
      .select(col("docId").as(idCol), col("ts").as(tsCol),
        col("text").as(textCol))
    // corrections: in-batch-owned buckets whose owner did not survive get
    // reassigned to the bucket's surviving doc (at most one — two survivors
    // can never share a bucket) or released so later arrivals start fresh
    val withSurv = rows
      .join(survivorIds.withColumn("surv", lit(1)), Seq("docId"), "left")
    val corrections = withSurv.filter(col("priorOwner") === false)
      .groupBy("bandKey").agg(
        max(when(col("surv") === 1 && col("docId") === col("ownerDocId"), 1)
          .otherwise(0)).as("owner_survived"),
        max(when(col("surv") === 1, col("docId"))).as("surv_toucher"),
        max("ts").as("ts"))
      .filter(col("owner_survived") === 0)
      .select(col("bandKey"),
        coalesce(col("surv_toucher"), lit(ReleaseOwner)).as("newOwner"),
        col("ts"))
      .as[Feedback]
    BatchFold(survivors, corrections, () => perDoc.count(),
      residual.iterator.map(_._1).toSet.size,
      () => { survivorIds.unpersist(); rows.unpersist(); () })
  }

  /** Run [[dedupNearOwnership]] with a feedback loop and deliver each
    * micro-batch's surviving docs plus the batch's ownership corrections to
    * `sink`. The caller routes the corrections into the `feedback` stream
    * (write them to the queue/log topic backing it; in tests, collect and
    * `MemoryStream.addData`) — they apply before the NEXT trigger's data,
    * so a dead doc's buckets suppress look-alikes for at most one trigger
    * rather than until the state TTL.
    *
    * Contract: the frames passed to `sink` are views over the persisted
    * micro-batch and are unpersisted as soon as `sink` returns — consume
    * them synchronously inside the callback (the standard foreachBatch
    * rule), never stash them for later.
    *
    * Degradation: feedback events carry the originating batch's event time
    * and pass through the same watermark; in a catch-up run where event
    * time jumps more than the watermark delay between triggers, a
    * correction can be dropped as late data — the affected bucket then
    * falls back to the TTL-bounded window (the no-feedback behavior), never
    * to unbounded suppression. */
  def dedupNearWithFeedback(docs: DataFrame, textCol: String, tsCol: String,
      idCol: String, feedback: Option[Dataset[Feedback]],
      watermark: String = "10 minutes", shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      stateTtlMs: Long = 10 * 60 * 1000L,
      keyer: Option[String => Array[Long]] = None)
      (sink: (DataFrame, Dataset[Feedback]) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[OwnedRow] = {
    val owned = dedupNearOwnership(docs, textCol, tsCol, idCol, watermark,
      shingleN, numHashes, bands, stateTtlMs, feedback, keyer)
    owned.writeStream.foreachBatch { (batch: Dataset[OwnedRow], _: Long) =>
      val fold = foldBatch(batch, idCol, tsCol, textCol)
      try sink(fold.survivors, fold.feedback) finally fold.cleanup()
    }
  }

  /** Run [[dedupNearOwnership]] and deliver each micro-batch's SURVIVING
    * docs (docId, ts, text) to `sink`. Without a feedback stream a bucket
    * whose recorded owner was itself dropped suppresses later arrivals until
    * the TTL — use [[dedupNearWithFeedback]] to close that window. */
  def dedupNear(docs: DataFrame, textCol: String, tsCol: String, idCol: String,
      watermark: String = "10 minutes", shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      stateTtlMs: Long = 10 * 60 * 1000L)
      (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[OwnedRow] =
    dedupNearWithFeedback(docs, textCol, tsCol, idCol, None, watermark,
      shingleN, numHashes, bands, stateTtlMs)((survivors, _) =>
      sink(survivors))

  /** Embedding band event: the doc's int8 sketch rides EVERY band row (a
    * vector sketch is small and fixed-width — dim bytes — unlike document
    * text, which the text path deliberately keeps off the band shuffle).
    * `des` marks the doc's one DESIGNATED row — the row the survivor fold
    * may emit, mirroring the text path's single text-carrying row. */
  final case class EmbBandEvent(bandKey: Long, docId: Long,
      ts: java.sql.Timestamp, codes: Array[Byte], des: Boolean)

  /** Bounded per-bucket owner sketches: parallel arrays of (docId, codes),
    * insertion-ordered (earliest first). */
  final case class OwnerSketches(ids: Array[Long], codes: Array[Array[Byte]])

  /** Streaming near-dup suppression for EMBEDDING streams: multi-probe
    * hyperplane sign buckets ([[graft.operators.Similarity.probeBuckets]] —
    * the batch [[graft.operators.Similarity.cosineDedup]] candidate
    * blocking) route arrivals to per-bucket state that holds a BOUNDED
    * list of owner SKETCHES (int8-quantized vectors, dim bytes each), and
    * a doc is marked a duplicate only after an in-state cosine
    * confirmation against an owner clears `tau`.
    *
    * The confirmation is the load-bearing difference from the text path:
    * text band keys are 64-bit MinHash band hashes, whose collision
    * probability for DISSIMILAR docs is ~0, so bucket collision alone is
    * a sound candidate test there. Hyperplane buckets span only 2^planes
    * values — for two random directions P(bucket sets intersect) =
    * P(Hamming <= 2 over the sign bits) ≈ 1.9% at planes = 12, so at
    * corpus scale unconfirmed collisions would suppress unrelated vectors
    * wholesale. With the sketch confirm, a collision costs one int8 dot
    * product (sim error ~2%, so set `tau` with that margin vs the batch
    * threshold) and dissimilar docs pass untouched.
    *
    * Bounded-state contract: at most `maxOwnersPerBucket` sketches per
    * bucket (earliest-first; a full bucket stops ADMITTING new owners, so
    * later duplicates of an unadmitted doc in that bucket go unsuppressed
    * — recall loss, never a wrong drop), event-time TTL expiry, and docs
    * are compared only against owners, never pairwise. Zero-norm/empty
    * vectors never match and are never admitted as owners (batch parity:
    * they cannot clear a positive cosine gate). Survivors arrive as
    * (idCol, tsCol) — re-join the embedding by id downstream. */
  def dedupNearEmbedding(docs: DataFrame, embCol: String, tsCol: String,
      idCol: String, tau: Double = 0.9, watermark: String = "10 minutes",
      planes: Int = 12, stateTtlMs: Long = 10 * 60 * 1000L,
      maxOwnersPerBucket: Int = 8)
      (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[OwnedRow] = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def cosineCodes(a: Array[Byte], b: Array[Byte]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    // per bucket, per trigger: confirm each arrival (ts, docId order)
    // against prior owners first, then owners admitted this trigger; emit
    // one OwnedRow per band row — self-owned when nothing confirmed, so
    // unconfirmed collisions classify as ALIVE in the fold
    def confirmOwners(bandKey: Long, rows: Iterator[EmbBandEvent],
        state: GroupState[OwnerSketches]): Iterator[OwnedRow] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val rs = rows.toVector.sortBy(r => (r.ts.getTime, r.docId))
      if (rs.isEmpty) return Iterator.empty
      val prior = state.getOption.getOrElse(
        OwnerSketches(Array.empty, Array.empty))
      val nPrior = prior.ids.length
      val ids = collection.mutable.ArrayBuffer.from(prior.ids)
      val codes = collection.mutable.ArrayBuffer.from(prior.codes)
      val out = rs.map { r =>
        var matched = -1
        var i = 0
        while (matched < 0 && i < ids.length) {
          // a doc can appear as its own owner across probe buckets; never
          // self-match
          if (ids(i) != r.docId && cosineCodes(r.codes, codes(i)) >= tau)
            matched = i
          i += 1
        }
        val des = if (r.des) "" else null
        if (matched >= 0)
          OwnedRow(r.docId, r.ts, bandKey, ids(matched), matched < nPrior,
            text = des)
        else {
          val zero = r.codes.forall(_ == 0)
          if (!zero && ids.length < maxOwnersPerBucket &&
              !ids.contains(r.docId)) {
            ids += r.docId; codes += r.codes
          }
          OwnedRow(r.docId, r.ts, bandKey, r.docId, priorOwner = false,
            text = des)
        }
      }
      state.update(OwnerSketches(ids.toArray, codes.toArray))
      state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs() + 1,
        rs.map(_.ts.getTime).max + stateTtlMs))
      out.iterator
    }

    val bandRows = docs
      .filter(col(embCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col(embCol).as("emb"))
      .as[(Long, java.sql.Timestamp, Array[Float])]
      .flatMap { case (docId, ts, emb) =>
        val degenerate = emb == null || emb.isEmpty || emb.forall(_ == 0f)
        if (degenerate)
          // zero-norm: a synthetic self bucket (never matches, never
          // admitted — but the doc must still appear in the fold)
          Iterator.single(EmbBandEvent(
            graft.functions.TextAnalysis.mix64(docId ^ 0x5ee7a11dL), docId,
            ts, Array.emptyByteArray, des = true))
        else {
          val (_, codes) = graft.operators.Similarity.quantizeInt8(emb)
          graft.operators.Similarity.probeBuckets(emb, planes).iterator
            .zipWithIndex.map { case (b, i) =>
              EmbBandEvent(b.toLong, docId, ts, codes, des = i == 0)
            }
        }
      }
    val owned = bandRows
      .withWatermark("ts", watermark)
      .groupByKey(_.bandKey)
      .flatMapGroupsWithState[OwnerSketches, OwnedRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(confirmOwners)
    owned.writeStream.foreachBatch { (batch: Dataset[OwnedRow], _: Long) =>
      val fold = foldBatch(batch, idCol, tsCol)
      try sink(fold.survivors.select(idCol, tsCol)) finally fold.cleanup()
    }
  }

  /** Gram occurrence heading into the first-claim state machine. The key
    * is the full 128-bit gram identity (two independent 64-bit chains,
    * [[graft.functions.TextAnalysis.gramChain]] under the streaming
    * seeds): this path feeds [[spanStrip]], i.e. actual text deletion, so
    * it carries the same collision bound as the batch digests — one
    * 64-bit lane alone would silently mark unique grams foreign once the
    * in-TTL gram population reaches the billions. */
  final case class GramEvent(k1: Long, k2: Long, docId: Long, pos: Int,
      ts: java.sql.Timestamp)

  /** A gram occurrence that duplicates an earlier-claimed gram. */
  final case class ForeignGram(docId: Long, pos: Int, ts: java.sql.Timestamp)

  /** Streaming span suppression, phase 1 — the online analogue of
    * [[graft.operators.Dedup.stripSpanStats]]'s keep-first rule: per
    * word-n-gram digest, the first arrival (event time, then (docId, pos))
    * claims the gram; every later occurrence emits a foreign mark.
    *
    * KEEPER CONTRACT vs the batch pass: only for occurrences meeting in ONE
    * trigger with EQUAL timestamps does the tie-break (docId, pos) resolve
    * exactly like the batch struct-min. Streaming ranks event time first
    * and, across triggers, claim order IS arrival order — so a
    * later-arriving occurrence with a smaller (docId, pos) is marked
    * foreign where the batch pass would have kept it (pinned by the
    * keeper-divergence case in StreamingDedupSpec). That is the price of
    * bounded one-bool-per-gram state: revising an earlier claim would mean
    * retracting already-emitted marks.
    *
    * Scale design: state is ONE boolean per distinct gram digest seen within
    * the TTL — bounded by (ingest rate x TTL), never corpus size, and a
    * duplicate arriving after expiry passes (the same bounded-state tradeoff
    * as [[dedupExact]]). Marks carry (docId, pos) only: no document text
    * amplifies through the stateful shuffle (a W-word doc contributes ~W
    * short events, the same volume the batch gram shuffle moves).
    *
    * UPGRADE NOTE: the state-key function changed in this version (joined-
    * gram hashString -> per-token 128-bit chain). A checkpointed stream
    * restarted across the change resumes without error but its pre-upgrade
    * claims are keyed under the old scheme — they stop suppressing new
    * arrivals and age out at the TTL. Restart from a fresh checkpoint for
    * exact continuity. */
  def spanForeignMarks(docs: DataFrame, textCol: String, tsCol: String,
      idCol: String, n: Int = 8, watermark: String = "10 minutes",
      stateTtlMs: Long = 10 * 60 * 1000L): Dataset[ForeignGram] = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def mark(key: (Long, Long), rows: Iterator[GramEvent],
        state: GroupState[Boolean]): Iterator[ForeignGram] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val rs = rows.toVector
      val claimed = state.exists
      // already claimed: every occurrence is foreign, no ordering needed;
      // otherwise only the (ts, docId, pos)-minimum matters — a single-pass
      // min, never a full sort (a hot boilerplate gram can put 10^4+
      // occurrences of ONE key into a trigger)
      val foreign =
        if (claimed) rs
        else {
          val keeper = rs.minBy(r => (r.ts.getTime, r.docId, r.pos))
          rs.filter(_ ne keeper)
        }
      if (!claimed) state.update(true)
      state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs() + 1,
        rs.iterator.map(_.ts.getTime).max + stateTtlMs))
      foreign.iterator.map(r => ForeignGram(r.docId, r.pos, r.ts))
    }

    docs
      .filter(col(textCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("docId"), col(tsCol).as("ts"),
        col(textCol).as("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .flatMap { case (docId, ts, text) =>
        // batch tokenization parity: Spark SQL trim strips SPACES only
        // (Java String.trim would also strip tabs/newlines and desync gram
        // digests and positions from the batch path)
        val w = text.dropWhile(_ == ' ')
          .reverse.dropWhile(_ == ' ').reverse.split(" ")
        if (w.length < n) Iterator.empty
        else {
          // per-token hashes once, then the shared gram chain
          // (TextAnalysis.gramChain) per position under BOTH streaming
          // seeds — no per-gram string building, 128-bit identity like
          // the batch kernel (this feeds text deletion)
          import graft.functions.TextAnalysis
          val t1 = w.map(TextAnalysis.hashString)
          val t2 = t1.map(h => TextAnalysis.mix64(h ^ TextAnalysis.GramTokenTweak))
          (0 to w.length - n).iterator.map { i =>
            GramEvent(
              TextAnalysis.gramChain(t1, i, n, TextAnalysis.StreamSeedA),
              TextAnalysis.gramChain(t2, i, n, TextAnalysis.StreamSeedB),
              docId, i + 1, ts)
          }
        }
      }
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.k1, e.k2))
      .flatMapGroupsWithState[Boolean, ForeignGram](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(mark)
  }

  /** Streaming span strip: per micro-batch, the foreign marks close into
    * maximal per-document spans with the batch island kernel (a document's
    * grams all travel in one trigger, so its islands complete within the
    * batch) and `sink` receives (doc_id, span_start, span_end, n_dup_grams)
    * — fully distributed, nothing collects to the driver.
    *
    * Cross-trigger semantics: a gram claimed in trigger N suppresses its
    * occurrences in trigger N+1, and those foreign marks close into spans
    * against trigger N+1's marks only — correct, because documents are
    * atomic per trigger, so every island is complete within its own batch.
    * The keeper itself follows [[spanForeignMarks]]'s arrival-order
    * contract, which can diverge from the batch keep-first pass on
    * unequal timestamps (see its scaladoc; both properties are pinned in
    * StreamingDedupSpec). */
  def spanStrip(docs: DataFrame, textCol: String, tsCol: String,
      idCol: String, n: Int = 8, watermark: String = "10 minutes",
      stateTtlMs: Long = 10 * 60 * 1000L)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[ForeignGram] =
    spanForeignMarks(docs, textCol, tsCol, idCol, n, watermark, stateTtlMs)
      .writeStream.foreachBatch { (batch: Dataset[ForeignGram], _: Long) =>
        sink(graft.operators.Dedup.mergeIslands(
          batch.select(col("docId").as("doc_id"), col("pos")), n))
      }

  /** Stateless streaming quality gate: attach the batch quality columns and
    * keep docs inside the given bounds (same kernel as the batch path, so
    * online and offline filtering agree). */
  def qualityFilter(docs: DataFrame, textCol: String,
      minTokens: Long = 5, maxTokens: Long = 100000,
      minAlphaRatio: Double = 0.5): DataFrame = {
    val scored = graft.functions.TextAnalysis.withQuality(docs, textCol)
    scored.filter(col("n_tokens").between(minTokens, maxTokens) &&
      col("alpha_ratio") >= minAlphaRatio)
  }

  /** Windowed per-source arrival statistics (docs + chars per source per
    * tumbling window) — the monitoring signal for a streaming ingest:
    * watermarked, so late data beyond the delay is dropped and state stays
    * bounded. */
  def sourceWindowStats(docs: DataFrame, sourceCol: String, textCol: String,
      tsCol: String, windowLen: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    docs
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("n_chars"))
  }
}
