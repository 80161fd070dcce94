package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY.md §2.4 extension): flag corpus
  * documents that share any word n-gram with a benchmark/eval document set —
  * the standard overlap check training pipelines run so evaluation data
  * never leaks into the training corpus.
  *
  * Scale shape: the benchmark side is tiny relative to a 100 TB corpus
  * (eval suites are thousands of documents), so its distinct shingle set is
  * broadcast and the corpus side never shuffles for the probe — shingling
  * is a codegen'd projection, the join is a BroadcastHashJoin, and the only
  * shuffle is the per-doc hit count over matching shingles (a vanishing
  * fraction of the corpus). Contamination detection is therefore one linear
  * scan of the corpus.
  */
object Decontaminate {

  /** Per-corpus-doc contamination evidence: (doc_id, n_hits) where n_hits
    * counts DISTINCT word n-grams the doc shares with any benchmark doc.
    * Docs with no overlap are absent (inner probe). */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val c = Dedup.shingles(corpus, n)
    val b = Dedup.shingles(benchmark, n).select("s").distinct()
    c.join(broadcast(b), "s")
      .groupBy("doc_id").agg(count("*").as("n_hits"))
  }

  /** The decontaminated corpus: drop every document sharing at least
    * `minHits` n-grams with the benchmark set (anti-join on the evidence). */
  def clean(corpus: DataFrame, benchmark: DataFrame, n: Int, minHits: Long = 1L): DataFrame =
    corpus.join(
      contamination(corpus, benchmark, n).filter(col("n_hits") >= minHits),
      Seq("doc_id"), "left_anti")

  /** Streaming form of [[contamination]]: documents are checked in-flight.
    * The probe is a STATELESS stream-static broadcast join (the benchmark
    * is a static relation, so no join state accumulates), and the only
    * streaming state is the per-contaminated-doc hit count — bounded by
    * contamination volume, not stream length. Run in Update mode: each
    * micro-batch upserts refined counts (a doc's count only grows).
    * Replay equivalence with the batch form is asserted in StreamingSpec. */
  def contaminationStream(docs: DataFrame, benchmark: DataFrame, n: Int): DataFrame =
    contamination(docs, benchmark, n) // the identical declarative pipeline
    // runs unchanged on a streaming frame: shingling is stateless, the
    // benchmark probe is a stream-static join, only the count holds state
}
