package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-level (paragraph-style) deduplication (SURVEY.md §2.4
  * extension): remove duplicated SPANS of text corpus-wide while keeping
  * the rest of each document — the Dolma/RefinedWeb-style middle ground
  * between whole-document dedup (misses boilerplate embedded in otherwise
  * unique pages) and n-gram fuzzy dedup (drops whole documents). Web-scale
  * corpora mark paragraph boundaries with newlines; this corpus is
  * single-line, so the segment unit is a fixed `w`-token chunk — the
  * operator is the same either way (only the segmenter column differs).
  *
  * Scale shape: segmenting is a codegen'd per-row projection (no shuffle);
  * choosing each segment's canonical first occurrence is ONE hash shuffle
  * with map-side partial aggregation (`min(struct(doc_id, seg_idx))` —
  * skew-robust where a `row_number` window over a million-fold duplicated
  * boilerplate segment would sort one giant partition); reassembly is one
  * shuffle back to doc_id. Two exchanges total for corpus-wide span dedup.
  */
object SegmentDedup {

  /** (doc_id, seg_idx, seg): consecutive `w`-token chunks of each doc
    * (last chunk may be shorter). Docs with no tokens vanish (cheap
    * hasTokens scan predicate — the pushdown-safe gate TextAnalysis
    * uses; a size(ws) filter above the tokenize projection would re-split
    * per row at the scan). */
  private[operators] def segments(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 1, s"segment width must be >= 1, got $w")
    val ws = col("__ws")
    docs
      .filter(TextAnalysis.hasTokens(col("text")))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__ws"))
      .select(col("doc_id"),
        posexplode(
          transform(sequence(lit(0), ((size(ws) + lit(w - 1)) / lit(w)).cast("int") - 1),
            i => array_join(slice(ws, i * w + 1, lit(w)), " "))))
      .toDF("doc_id", "seg_idx", "seg")
  }

  /** Corpus with every duplicated `w`-token segment removed except its
    * first occurrence (ordered by doc_id, then position — intra-doc
    * repeats collapse too), surviving segments re-joined in document
    * order. Output: doc_id, text_clean, n_segs_kept; documents whose
    * every segment was claimed earlier disappear (no empty-text rows). */
  def dedupSegments(docs: DataFrame, w: Int): DataFrame = {
    val segs = segments(docs, w)
    // first-occurrence choice as an AGGREGATE, not a window: min(struct)
    // gets map-side partial aggregation, so a boilerplate segment repeated
    // across millions of docs costs one partial row per input partition —
    // a row_number window would shuffle-sort every copy into one partition
    val survivors = segs
      .groupBy("seg")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("__k"))
      .select(col("__k.doc_id").as("doc_id"), col("__k.seg_idx").as("seg_idx"), col("seg"))
    survivors
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg")), " ").as("text_clean"),
        count("*").as("n_segs_kept"))
  }

  /** Corpus with every HIGH-DOCUMENT-FREQUENCY `w`-token segment removed
    * from ALL documents — the CCNet/Dolma-style boilerplate strip:
    * a segment appearing in >= `minDocs` DISTINCT documents is boilerplate
    * (navigation chrome, cookie banners, license headers), and unlike
    * [[dedupSegments]] even its first occurrence goes. Output matches
    * dedupSegments (doc_id, text_clean, n_segs_kept); documents that were
    * pure boilerplate disappear.
    *
    * Scale shape: document frequency is one two-phase distinct-count hash
    * aggregate with map-side partials; the boilerplate set is at most
    * |segments|/minDocs rows — small BY CONSTRUCTION, shrinking as the
    * threshold rises — so the anti join is broadcast-eligible (left
    * unpinned: AQE converts it at runtime when it fits); reassembly is the
    * same per-doc aggregation as dedupSegments. */
  def removeBoilerplate(docs: DataFrame, w: Int, minDocs: Long): DataFrame =
    applyBoilerplate(segments(docs, w), fitBoilerplate(docs, w, minDocs))

  /** FIT ONLY: the boilerplate segment set — every `w`-token segment
    * appearing in >= `minDocs` distinct documents of the history corpus.
    * One two-phase distinct-count aggregate; the result is small by
    * construction (<= |segments|/minDocs rows). Persist it like a
    * [[QuantileGate.fitThreshold]] artifact and strip later corpora or an
    * ingest stream with [[stripBoilerplateFrozen]] — boilerplate churns
    * slowly (site chrome, license headers), so a daily refit guards a
    * continuously-arriving crawl. */
  def fitBoilerplate(docs: DataFrame, w: Int, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (1 would drop everything), got $minDocs")
    segments(docs, w)
      .groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("seg")
  }

  /** APPLY a frozen boilerplate set to any frame — batch or STREAMING.
    * Per document this is segment → anti-join the (small, broadcastable)
    * boilerplate set → reassemble within the document's own row group;
    * on a stream the anti join is stream-static and the reassembly
    * aggregation is per-doc (keyed state bounded by the micro-batch when
    * documents arrive whole, as in a crawl feed). */
  def stripBoilerplateFrozen(docs: DataFrame, boilerplate: DataFrame, w: Int): DataFrame =
    applyBoilerplate(segments(docs, w), boilerplate)

  /** Per-ROW frozen apply — the STREAM-COMPOSABLE twin of
    * [[stripBoilerplateFrozen]]: the frozen boilerplate set rides along as
    * a broadcast literal (it is small by construction — ≤
    * |segments|/minDocs rows), so the strip is a stateless codegen
    * projection: segment, filter against the literal, re-join — no
    * explode, no per-doc reassembly AGGREGATION. That matters for
    * composition: a streaming aggregation mid-query caps what can chain
    * after it, while this form slots between a frozen gate and the
    * stateful dedup/packing stages of ONE StreamingQuery. Output rows
    * match [[stripBoilerplateFrozen]] exactly — (doc_id, text_clean,
    * n_segs_kept), all-boilerplate docs vanish (asserted equal in
    * TextCurationSpec). Cost is |segments(doc)| · |boiler| comparisons
    * per row — use the join form when the frozen set outgrows broadcast
    * size. */
  def stripBoilerplateInline(docs: DataFrame, boiler: Seq[String], w: Int): DataFrame = {
    require(w >= 1, s"segment width must be >= 1, got $w")
    val ws = col("__ws")
    val boilLit = typedlit(boiler)
    docs
      .filter(TextAnalysis.hasTokens(col("text")))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__ws"))
      .select(col("doc_id"),
        filter(
          transform(sequence(lit(0), ((size(ws) + lit(w - 1)) / lit(w)).cast("int") - 1),
            i => array_join(slice(ws, i * w + 1, lit(w)), " ")),
          s => !array_contains(boilLit, s)).as("__kept"))
      .filter(size(col("__kept")) > 0)
      .select(col("doc_id"), array_join(col("__kept"), " ").as("text_clean"),
        size(col("__kept")).cast("long").as("n_segs_kept"))
  }

  private def applyBoilerplate(segs: DataFrame, boiler: DataFrame): DataFrame =
    segs.join(boiler.select("seg"), Seq("seg"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg")), " ").as("text_clean"),
        count("*").as("n_segs_kept"))
}
