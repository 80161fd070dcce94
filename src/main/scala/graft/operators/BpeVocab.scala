package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style tokenizer-vocabulary induction (SURVEY.md §2.4 extension):
  * learn merge rules from corpus statistics — the data-pipeline side of
  * training a subword tokenizer (Sennrich et al. 2016's public algorithm).
  * Words become symbol sequences (chars + an end-of-word marker); each
  * round counts adjacent symbol pairs weighted by word frequency, merges
  * the most frequent pair everywhere, and repeats.
  *
  * Scale shape: the corpus collapses to its WORD-FREQUENCY table first
  * (one shuffle over tokens — at 100 TB the vocab is orders of magnitude
  * smaller than the corpus and is the only thing iterated), each round is
  * one pair-count aggregation (shuffle sized by distinct pairs) plus a
  * per-row symbol fold, the argmax pair comes back as a one-row driver
  * scalar (like QuantileGate's threshold), and localCheckpoint truncates
  * the iterative lineage (same pattern as DupClusters). Deterministic:
  * ties break on (count desc, pair asc) in every engine.
  */
object BpeVocab {

  val EndOfWord = "</w>"

  /** (word, freq) over whitespace tokens — the only corpus-sized shuffle. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count("*").as("freq"))

  /** Char symbols + end-of-word marker: "the" → [t, h, e, </w>]. */
  private def symbolsCol(word: Column): Column =
    concat(filter(split(word, ""), c => length(c) > 0), array(lit(EndOfWord)))

  /** (word, freq, syms) — the iterated frame. */
  def symbolized(docs: DataFrame): DataFrame =
    wordFreqs(docs).withColumn("syms", symbolsCol(col("word")))

  /** Adjacent-pair counts weighted by word frequency: (a, b, cnt).
    * The pair array is guarded inside the projection (when → empty;
    * explode drops it) — a size filter above the symbol projection would
    * be predicate-pushed into a second per-row evaluation. */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val s = col("syms")
    vocab.select(col("freq"),
      explode(when(size(s) >= 2,
        transform(sequence(lit(0), size(s) - 2),
          i => struct(get(s, i).as("a"), get(s, i + lit(1)).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Greedy left-to-right merge of the (a, b) pair inside one symbol
    * array: fold appending symbols, replacing a trailing `a` when `b`
    * follows. "aaa" merging (a,a) → [aa, a], the standard BPE semantics. */
  private[operators] def mergePairCol(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (out, x) => when(size(out) > 0 && element_at(out, -1) === a && x === b,
        concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
        .otherwise(concat(out, array(x))))

  case class Merge(a: String, b: String, cnt: Long)

  /** Learn `k` merge rules; returns (rules in order, final symbolized
    * vocab). Each round: count pairs → one-row argmax to the driver →
    * rewrite symbol arrays → checkpoint. */
  def learnMerges(docs: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    var vocab = symbolized(docs).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var exhausted = false
    while (i < k && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top.head
        val (a, b) = (r.getString(0), r.getString(1))
        merges += Merge(a, b, r.getLong(2))
        vocab = vocab.withColumn("syms", mergePairCol(col("syms"), a, b))
          .localCheckpoint()
      }
      i += 1
    }
    (merges.toSeq, vocab)
  }
}
