package graft.queries

import graft.PlanCapture.CheckpointOps
import graft.operators.{AudioDedup, Decontaminate, Dedup, ImageDedup,
  Multimodal, Sampling, SeqPack, TextAnalysis, VideoDedup, ZScore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed capstone pipelines — the end-to-end flows a 100 TB
  * curation user actually runs, each stage a registered operator:
  *
  *  - [[deconPipeline]] (qe33): hash-stable train split → exact dedup
  *    (min-id survivor) → 5-gram benchmark decontamination → token-budget
  *    domain mix → per-source sharded packing manifest.
  *  - [[gatedPipeline]] (qe40): the statistical-gate sibling — split →
  *    dedup → per-source z-score length gate fit on the survivors
  *    (|z| ≤ 2) → mix → pack.
  *
  * ONE definition shared by the registered queries (Extensions, budget
  * 1000 at the driver SFs) and tools/ScalingProbe's capstone ladder rows
  * (budget scaled with the corpus so later stages keep constant
  * selectivity) — the probe certifies the REGISTERED composition, never
  * a re-implemented copy that could drift from it. */
object Capstones {

  /** Shared front: train split (80/10/10 hash buckets, seed 42) → exact
    * dedup survivors, as doc_id. */
  private def trainSurvivors(docs: DataFrame): DataFrame = {
    val train = Sampling.splitByHash(docs.select("doc_id"), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .filter(col("split") === "train").select("doc_id")
    Dedup.exactDedup(docs.join(train, "doc_id"), Seq("text"), "doc_id")
      .select(col("keep_id").as("doc_id"))
  }

  /** Shared tail: (doc_id, source, n_tok) → per-source token-budget mix →
    * sharded packing-bin manifest. Unordered — the registered query adds
    * the oracle's total ORDER BY; the probe prices the computation. */
  private def mixAndPack(withTok: DataFrame, budget: Long): DataFrame = {
    val mixed = Sampling.budgetedTakePerGroup(
        withTok, "source", "doc_id", "n_tok", budget)
      .select("source", "doc_id", "n_tok")
    SeqPack.binStatsSharded(mixed, "source", "doc_id", "n_tok", 256L)
  }

  private def tokenized(docs: DataFrame): DataFrame =
    docs.filter(TextAnalysis.hasTokens(col("text")))
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))

  /** qe33 — decontamination capstone. `docs` needs (doc_id, text, source,
    * n_chars); the benchmark set is the deterministic doc_id % 19 == 3
    * slice the oracle mirrors. */
  def deconPipeline(docs: DataFrame, budget: Long): DataFrame = {
    val surv = trainSurvivors(docs)
    val bench = docs.filter(col("doc_id") % 19 === 3)
    val cleaned = Decontaminate.clean(docs.join(surv, "doc_id"), bench, 5)
    mixAndPack(tokenized(cleaned), budget)
  }

  /** qe40 — z-score-gated capstone (gate fit on the survivors). */
  def gatedPipeline(docs: DataFrame, budget: Long): DataFrame = {
    val surv = trainSurvivors(docs)
    val sdocs = docs.join(surv, "doc_id")
    val gated = ZScore.gate(
      sdocs.select("doc_id", "source", "n_chars"), "source", "n_chars", 2.0)
    mixAndPack(tokenized(sdocs.join(gated.select("doc_id"), "doc_id")), budget)
  }

  /** qe75 — crawl media-dedup capstone: one mixed binary column → ONE
    * mapPartitions pass that triages each payload by its bytes and
    * computes the modality's content key in the same breath
    * ([[routedSignatures]]) → one shared min-id survivor join. One corpus
    * scan, one decode pass, one shuffle — a per-leg filter-and-dedup
    * composition would rescan the corpus and re-run the triage parsers
    * once per modality, which is the difference that matters at 100 TB.
    * Unrecognized or undecodable payloads get a null key and survive as
    * singletons through [[Dedup.minIdSurvivorByKey]]'s contract (the T11
    * dead-letter posture: the caller decides, the dedup never merges
    * what it could not read). */
  def crawlMediaDedup(media: DataFrame): DataFrame =
    dedupedSignatures(media)
      .select(col("doc_id"), col("kind"), col("survivor_id"), col("is_kept"))

  /** The ONE dedup composition both the batch capstone and its
    * incremental twin project from — a drift in the checkpoint/audit or
    * key column reaches both or neither. */
  private def dedupedSignatures(media: DataFrame): DataFrame =
    Dedup.minIdSurvivorByKey(
      routedSignatures(media).auditedCheckpoint(), "content_key")

  /** STREAMING twin of [[crawlMediaDedup]]: [[routedSignatures]] is a
    * stateless projection (streaming-legal), so the survivor state is ONE
    * dropDuplicates on the kind-prefixed content key — FIRST-seen, which
    * under an id-ordered replay equals the batch min-id survivor set
    * (asserted in StreamingSpec). Emits kept rows only — the crawl-ingest
    * shape. Pair with a watermark + dropDuplicatesWithinWatermark for
    * bounded state on always-on streams. For sources that do NOT arrive
    * id-ordered (a distributed crawl frontier), use
    * [[crawlMediaDedupStreamMinId]], which is batch-equivalent under
    * arbitrary arrival. */
  def crawlMediaDedupStream(media: DataFrame): DataFrame =
    Dedup.firstSeenByKey(routedSignatures(media), "content_key")

  /** MIN-ID streaming twin of [[crawlMediaDedup]] (r16): the same
    * [[routedSignatures]] in-flight triage+decode, but the survivor state
    * is [[graft.streaming.StreamingDedup.minIdSurvivorStream]]'s per-key
    * running minimum — so the final survivor SET equals the batch
    * capstone's under ARBITRARY arrival order and partitioning, not just
    * the id-ordered replay [[crawlMediaDedupStream]]'s first-seen contract
    * requires. Emits (key, survivor_id) improvements; read the final
    * survivors with `groupBy(key).min(survivor_id)` at the sink. */
  def crawlMediaDedupStreamMinId(media: DataFrame)
      : org.apache.spark.sql.Dataset[graft.streaming.StreamingDedup.Survivor] =
    graft.streaming.StreamingDedup.minIdSurvivorStream(
      routedSignatures(media), "content_key")

  /** INCREMENTAL twin of [[crawlMediaDedup]] — the re-crawl case: a new
    * batch dedups against the STORED corpus's frozen content-key set (one
    * narrow distinct-key frame, Artifacts-persisted by the caller, never
    * the stored payloads) and then within itself. A key already in the
    * frozen set is never kept — re-crawled spellings of stored content
    * drop without touching a stored byte; genuinely new content dedups to
    * its min-id survivor as in the batch form. Refused payloads (null
    * key) stay kept singletons — they match no frozen key by contract.
    * Plan: one decode pass, one survivor shuffle, one equi-join against
    * the key set — the join side is keys only, so at 100 TB it is the
    * small fraction of corpus bytes that actually ships. */
  def crawlMediaDedupAgainst(increment: DataFrame,
                             frozenKeys: DataFrame): DataFrame = {
    // defensive distinct: a caller-supplied key frame with duplicate
    // keys (e.g. a union of two snapshots' sets) would otherwise fan out
    // the left join and silently duplicate verdict rows; the frame is
    // keys-only, so the dedup is cheap
    dedupedSignatures(increment).join(
        frozenKeys.select(col("content_key")).distinct()
          .withColumn("__seen", lit(1)),
        Seq("content_key"), "left")
      .select(col("doc_id"), col("kind"),
        col("__seen").isNotNull.as("seen"),
        when(col("__seen").isNotNull, 0).otherwise(col("is_kept"))
          .cast("int").as("is_kept"))
  }

  /** The frozen key set [[crawlMediaDedupAgainst]] consumes: the distinct
    * non-null content keys of a stored corpus — the ONLY state a re-crawl
    * dedup needs to retain per snapshot. */
  def mediaKeySet(stored: DataFrame): DataFrame =
    routedSignatures(stored)
      .filter(col("content_key").isNotNull)
      .select("content_key").distinct()

  /** Evolve a frozen key set with a new batch — the APPEND half of the
    * incremental crawl loop (r14 verdict #5): prior keys ∪ the batch's
    * distinct content keys. The prior side is whatever frame the caller
    * holds (in production an Artifacts parquet scan), so HISTORY IS NEVER
    * RE-DECODED — append cost is one batch decode plus a key-set-sized
    * distinct, which is what lets N successive crawls run without
    * re-fitting the corpus key set from scratch. Persisted through
    * [[graft.Artifacts.getOrFit]] under a key derived from (prior key,
    * batch predicate), each link is an atomic content-keyed artifact —
    * kill/resume at worst refits ONE link, never the chain (the getOrFit
    * rename contract). append(b1) followed by dedup(b2) is provably
    * dedup-against-union: keys(stored) ∪ keys(b1) == keys(stored ∪ b1)
    * because [[mediaKeySet]] is a per-row map + distinct (asserted in
    * CapstonesSpec). */
  def appendKeySet(prior: DataFrame, batch: DataFrame): DataFrame =
    prior.select("content_key")
      .unionByName(mediaKeySet(batch))
      .distinct()

  /** (doc_id, kind, content_key) in one pass: triage by the byte-level
    * header parsers ([[Multimodal.mediaKind]]'s precedence, plus one
    * router-level refinement: an ANIMATED GIF routes video, ahead of the
    * image branch — see the inline note), then
    * the kind's content hash — [[ImageDedup.pixelHash]] over decoded
    * pixels, [[AudioDedup.sampleHash]] over normalized PCM,
    * [[VideoDedup.contentHash]] over the frame-pixel sequence. Keys are
    * kind-prefixed so equal digests from different modalities can never
    * merge. Null key = refused (unknown container OR recognized but
    * undecodable). */
  private[queries] def routedSignatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        // GIF triage runs ONE byte walk and splits three ways (r14
        // verdict #4): >= 2 frames → the video leg (the GIF magic would
        // otherwise parse as an image and dedup on frame 0 alone,
        // merging different animations that share a first frame);
        // exactly 1 → the ordinary image leg below; TORN (-1) → refuse
        // outright — frame 0 of a torn animation often still decodes,
        // and keying on it would merge animations the engine could not
        // read (the null-key singleton contract).
        val gifWalk =
          if (p != null && Multimodal.AnimatedGif.isGif(p))
            graft.functions.GifFrames.count(p)
          else 0 // not a GIF: inert in both guards below
        val (kind, key) =
          if (gifWalk >= 2) {
            val (_, h) = VideoDedup.hashFrames(
              Multimodal.AnimatedGif.frameSource(p, gifWalk))
            ("video", if (h == null) null else "vid:" + h)
          } else if (gifWalk == -1) {
            ("image", null) // torn GIF: recognized, unreadable — singleton
          } else if (p != null && graft.functions.ImageHeader.parse(p) != null) {
            val img = Multimodal.JdkImageCodec.read(p)
            ("image", if (img == null) null
              else "img:" + ImageDedup.pixelHash(img))
          } else if (p != null && graft.functions.AudioHeader.parse(p) != null) {
            val sig = AudioDedup.sampleHash(p)
            ("audio", if (sig == null) null else "aud:" + sig.sample_hash)
          } else if (p != null && graft.functions.VideoHeader.parse(p) != null) {
            val (_, h) = VideoDedup.contentHash(p)
            ("video", if (h == null) null else "vid:" + h)
          } else ("unknown", null)
        (id, kind, key)
      })
      .toDF("doc_id", "kind", "content_key")
  }
}
