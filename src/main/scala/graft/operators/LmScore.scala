package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the CCNet-style filter:
  * fit a unigram LM on a (clean) corpus, score every candidate document by
  * its mean negative log-likelihood under that LM, gate on the score.
  * Gibberish, OCR noise, and boilerplate-free word soup sit far from the
  * corpus distribution and score high; fluent in-distribution text scores
  * low. (CCNet uses a 5-gram KenLM; the unigram form keeps the exact same
  * fit/apply dataflow with an oracle-checkable scoring rule.)
  *
  * Scale shape:
  *  - `fitUnigram` is one map-side-combined hash shuffle (word count).
  *  - `nll` reduces each doc to (doc_id, term, tf) first — one corpus
  *    shuffle whose payload is DISTINCT terms per doc, not tokens — then
  *    hash-joins the LM on term. No broadcast hint: a 100 TB corpus vocab
  *    is itself large, so the term join must be allowed to shuffle; AQE
  *    broadcasts it when the fitted vocab is actually small.
  *  - Per-token log-probs quantize to scaled integers BEFORE the per-doc
  *    sum (weighted by exact long tf), so the score is bit-identical under
  *    any partitioning and any partial-aggregation order — the same
  *    determinism pattern as [[EmbedQuality]] / [[Retrieval]].
  *
  * The fit/apply split mirrors [[QuantileGate]]: the LM frame is a frozen
  * artifact, so a streaming micro-batch can score against it as a
  * stream-static join with no state.
  *
  * Reference tie-in: nearest analogue is the validation predicate stage
  * (`/root/reference/src/modules/hko/hko.cpp:108-117` drops records
  * failing a fixed range check); an LM gate is that same validate-and-route
  * stage with a learned, corpus-derived predicate.
  */
object LmScore {

  /** Unigram counts over the corpus: (term, cnt). One hash shuffle. */
  def fitUnigram(corpus: DataFrame): DataFrame =
    corpus.filter(TextAnalysis.hasTokens(col("text")))
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))

  /** Mean per-token negative log-likelihood of each doc under the fitted
    * unigram LM with add-one smoothing: (doc_id, n_tok, nll), nll rounded
    * to 4 decimals. Unseen terms get the smoothed floor 1/(T+V) — scoring
    * a stream against a frozen LM never divides by zero.
    *
    * The left join keeps docs whose every term is out-of-vocabulary; the
    * coalesce(cnt, 0) makes their contribution the smoothed floor rather
    * than dropping the rows (an inner join would silently deflate n_tok). */
  def nll(docs: DataFrame, lm: DataFrame): DataFrame = {
    // totals are 1 row derived from the (small relative to corpus) LM
    // frame. An EMPTY lm (wrong artifact path, over-eager filter) makes
    // sum() NULL — every score would be silently NULL and a downstream
    // gate would drop or pass the whole corpus; refuse loudly instead,
    // fused into the value path (nllStream's require, without an extra
    // driver job per call)
    val tot = lm.agg(
      when(count(lit(1)) > 0, sum(col("cnt")).cast("double"))
        .otherwise(raise_error(lit(
          "nll: empty language model — fit the LM before scoring " +
            "(an empty frame would silently NULL every score)"))).as("t_tok"),
      count(lit(1)).cast("double").as("v"))
    val tc = docs.filter(TextAnalysis.hasTokens(col("text")))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val c6 = floor(negate(log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) / (col("t_tok") + col("v"))))
      * lit(1e6) + lit(0.5)).cast("long") * col("tf")
    tc.join(lm, Seq("term"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("c6", c6)
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tok"),
        graft.functions.ScalarOps.r4(
          sum(col("c6")).cast("double") / lit(1e6) / sum(col("tf"))).as("nll"))
  }

  /** Fit on the corpus, score the same corpus — the self-scoring audit
    * form (every corpus outlier surfaces as a high-nll row). */
  def selfScore(docs: DataFrame): DataFrame = nll(docs, fitUnigram(docs))

  /** Streaming-legal twin of [[nll]] against a FROZEN lm frame: per-token
    * contributions feed ONE groupBy(doc_id) — no (doc_id, term)
    * pre-reduction, because chained streaming aggregations are unsupported;
    * the lm join is a plain stream-static join. Bit-identical to [[nll]]
    * (each token's quantized contribution is a per-term constant, so
    * summing per token or per term times tf is the same exact long sum).
    * Works on batch frames too — the replay-equivalence test runs both.
    *
    * The LM totals are FIT at plan construction (one 1-row driver pull of
    * the frozen artifact, like [[Decontaminate.contaminationBloom]]'s
    * sketch build) — a stream cannot cross-join even a 1-row frame, and
    * the totals of a frozen LM are themselves frozen. */
  def nllStream(docs: DataFrame, lm: DataFrame): DataFrame = {
    val totRow = lm.agg(
      sum(col("cnt")).cast("double").as("t_tok"),
      count(lit(1)).cast("double").as("v")).head()
    require(!totRow.isNullAt(0) && totRow.getDouble(1) > 0,
      "nllStream: the frozen LM frame is empty — fit it before streaming")
    val (tTok, v) = (totRow.getDouble(0), totRow.getDouble(1))
    val c6 = floor(negate(log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) / lit(tTok + v)))
      * lit(1e6) + lit(0.5)).cast("long")
    docs.filter(TextAnalysis.hasTokens(col("text")))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .join(lm, Seq("term"), "left")
      .withColumn("c6", c6)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        graft.functions.ScalarOps.r4(
          sum(col("c6")).cast("double") / lit(1e6) / count(lit(1))).as("nll"))
  }
}
