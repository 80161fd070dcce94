package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2.4 E4):
  * tokenization, quality stats, n-gram-heuristic language ID, document
  * fingerprinting. All pure built-in column expressions — codegen'd,
  * shuffle-free per-row transforms that scale linearly with input splits.
  */
object TextAnalysis {

  /** Whitespace tokenizer dropping empty tokens (stable across engines). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Token count (long). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish sub-word count: word pieces + digits + punctuation as separate
    * tokens (regex approximation of a byte-pair tokenizer's pre-split). */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Punctuation-character ratio — quality-scoring signal. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") / length(text)

  /** Per-document stats frame: doc_id, n_tokens, avg_token_len, punct_ratio.
    * Tokens materialize behind their own projection: column-level helpers
    * would re-run the regex split once per consumer (interpreted HOFs get
    * no CSE — 3 splits/row measured before this shape). */
  def textStats(docs: DataFrame): DataFrame = {
    val ws = col("__ws")
    docs
      // zero-token / empty docs would hit ANSI DIVIDE_BY_ZERO in the ratio
      // columns; the trim-length scan predicate excludes them cheaply
      // (same pushdown-safe gate repetitionStats uses)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("__ws"))
      .select(
        col("doc_id"),
        size(ws).cast("long").as("n_tokens"),
        graft.functions.ScalarOps.r4(
          aggregate(ws, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ws))
          .as("avg_token_len"),
        graft.functions.ScalarOps.r4(punctRatio(col("text"))).as("punct_ratio"))
  }

  /** Stopword marker sets for the n-gram-heuristic language ID. Tiny on
    * purpose: the heuristic must be expressible identically in the DuckDB
    * oracle. Ties break by the fixed en→de→es→fr priority; no hits → "und". */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "los", "es", "y", "que"),
    "fr" -> Seq("le", "les", "est", "et", "des"))

  private def markerHits(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, t => t.isInCollection(markers))).cast("long")

  /** Language-ID guess per document: doc_id, lang_guess.
    * Deterministic argmax with fixed priority order. Tokens materialize
    * behind one projection so the four marker filters share a single regex
    * split (interpreted HOFs get no CSE — 4 splits/row otherwise). */
  def langId(docs: DataFrame): DataFrame = {
    val scored = docs
      .select(col("doc_id"), tokens(col("text")).as("__ws"))
      .select(
        col("doc_id") +: LangMarkers.map { case (l, ms) => markerHits(col("__ws"), ms).as(s"s_$l") }: _*)
    val Seq(en, de, es, fr) = LangMarkers.map { case (l, _) => col(s"s_$l") }
    scored.select(
      col("doc_id"),
      when(greatest(en, de, es, fr) === 0, lit("und"))
        .when(en >= de && en >= es && en >= fr, lit("en"))
        .when(de >= es && de >= fr, lit("de"))
        .when(es >= fr, lit("es"))
        .otherwise(lit("fr"))
        .as("lang_guess"))
  }

  /** Text normalization for dedup/training: lowercase, collapse internal
    * whitespace runs, trim — the canonical form fed to exact dedup so
    * case/spacing variants collapse (all codegen'd built-ins). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 public
    * filter family): per doc, the duplicate-word fraction, the mass of the
    * single most frequent word, and the duplicate-bigram fraction — heavy
    * repetition marks boilerplate/spam for the quality gate.
    *
    * Shuffle-free by design: all three signals are per-row array math, so
    * at 100 TB this is a linear codegen'd+HOF scan with no exchange at all
    * (the groupBy-per-word alternative costs two shuffles). Token arrays
    * are materialized behind their own projection so the interpreted HOF
    * lambdas never re-evaluate the regex split per element. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    val bigrams = transform(sequence(lit(0), size(ws) - 2),
      i => concat_ws(" ", get(ws, i), get(ws, i + lit(1))))
    val withArrays = docs
      // the "has at least one token" gate must be CHEAP under pushdown: a
      // size(ws) >= 1 filter above the tokenize projection would be
      // predicate-pushed through it and re-run the regex split per row at
      // the scan (verified in the plan); trim-length is the exact same row
      // set as a codegen'd scan predicate
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), ws,
        when(size(ws) >= 2, bigrams).otherwise(array().cast("array<string>")).as("bg"))
    val bg = col("bg")
    val r4 = graft.functions.ScalarOps.r4 _
    // max word frequency as the longest run in the SORTED token array: one
    // O(n) aggregate pass instead of the O(distinct·n) nested
    // filter-per-distinct-word lambda (HOFs are interpreted; the quadratic
    // form measured ~4x slower at sf0.1)
    val maxRun = aggregate(sort_array(ws),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    withArrays.select(
      col("doc_id"),
      r4(lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws)).as("dup_word_frac"),
      r4(maxRun.cast("double") / size(ws)).as("top_word_frac"),
      r4(when(size(bg) > 0,
        lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg)).otherwise(0.0))
        .as("dup_2gram_frac"))
  }

  /** Document fingerprint (md5 of text) + per-fingerprint duplicate count.
    * At 100 TB the window runs per-fingerprint after a hash shuffle — skew
    * only if one exact text dominates, which exact-dedup removes first. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val byFp = docs.groupBy(md5(col("text")).as("fp")).agg(
      min("doc_id").as("keep_id"), count("*").as("fp_dups"))
    docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .join(byFp, "fp")
      .select(col("doc_id"), col("fp"), col("fp_dups"))
  }
}
