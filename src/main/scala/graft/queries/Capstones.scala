package graft.queries

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

  /** qe75 — crawl media-dedup capstone: one mixed binary column → byte
    * triage ([[Multimodal.mediaKind]], an in-place projection — no join
    * reattaches payloads) → the per-modality content-keyed dedup legs →
    * one survivor verdict per doc. Unrecognized payloads pass through as
    * kept singletons (the T11 dead-letter posture: the caller decides,
    * the dedup never merges what the triage could not read). */
  def crawlMediaDedup(media: DataFrame): DataFrame = {
    val kinds = media.withColumn("kind", Multimodal.mediaKind(col("payload")))
    def leg(kind: String, dedup: DataFrame => DataFrame): DataFrame =
      dedup(kinds.filter(col("kind") === kind))
        .select(col("doc_id"), lit(kind).as("kind"),
          col("survivor_id"), col("is_kept"))
    leg("image", ImageDedup.dedupByPixels)
      .unionByName(leg("audio", AudioDedup.dedupBySamples))
      .unionByName(leg("video", VideoDedup.dedupByFrames))
      .unionByName(kinds.filter(col("kind") === "unknown")
        .select(col("doc_id"), col("kind"),
          col("doc_id").as("survivor_id"), lit(1).as("is_kept")))
  }
}
