package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 retrieval, unigram-LM scoring, and the corpus data card: exact
  * scores re-derived independently in plain Scala on hand corpora, plus the
  * contract edges (ties, k, OOV terms, frozen-LM scoring, empty inputs). */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // independent single-node BM25 (same published formula, plain doubles)
  private def bm25Expect(tf: Long, dl: Long, n: Double, avgdl: Double,
                         df: Double, k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val w = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    math.floor(idf * w * 1e6 + 0.5).toLong
  }

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian durian durian durian")).toDF("doc_id", "text")

  test("bm25 matches the hand formula exactly on a 3-doc corpus") {
    val qs = Seq((100L, "apple durian")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus, qs, 10)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    val n = 3.0; val avgdl = 9.0 / 3.0
    def score(c6: Long) = math.floor(c6 / 1e6 * 1e4 + 0.5) / 1e4
    val d1 = bm25Expect(2, 3, n, avgdl, df = 2) // apple only
    val d2 = bm25Expect(1, 2, n, avgdl, df = 2)
    val d3 = bm25Expect(4, 4, n, avgdl, df = 1) // durian only
    val want = Seq((1L, d1), (2L, d2), (3L, d3))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, score(s), (i + 1).toLong) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }

  test("bm25 ties break by doc_id and k truncates") {
    val dup = Seq((1L, "kiwi mango"), (2L, "kiwi mango"), (3L, "kiwi mango"),
      (4L, "papaya")).toDF("doc_id", "text")
    val qs = Seq((7L, "kiwi")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(dup, qs, 2).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L)), got.toSeq.toString)
  }

  test("bm25: OOV query terms contribute nothing; all-OOV query returns no rows") {
    val qs = Seq((1L, "apple zzz"), (2L, "zzz yyy")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus, qs, 10).collect()
    assert(got.forall(_.getLong(0) == 1L), "all-OOV query must yield no rows")
    // same ranking as querying "apple" alone
    val alone = Retrieval.bm25TopK(corpus, Seq((1L, "apple")).toDF("qid", "qtext"), 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(r => (r.getLong(1), r.getDouble(2))).toSeq.sorted == alone.sorted)
  }

  test("bm25: repeated query term counts once; empty query frame yields empty result") {
    val qs = Seq((1L, "apple apple")).toDF("qid", "qtext")
    val once = Retrieval.bm25TopK(corpus, Seq((1L, "apple")).toDF("qid", "qtext"), 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val twice = Retrieval.bm25TopK(corpus, qs, 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(once == twice)
    val none = Retrieval.bm25TopK(corpus,
      Seq.empty[(Long, String)].toDF("qid", "qtext"), 10).collect()
    assert(none.isEmpty)
  }

  // independent single-node unigram-LM scorer
  private def nllExpect(docTokens: Seq[String], counts: Map[String, Long]): (Long, Double) = {
    val t = counts.values.sum.toDouble
    val v = counts.size.toDouble
    val s6 = docTokens.map { w =>
      math.floor(-math.log((counts.getOrElse(w, 0L) + 1.0) / (t + v)) * 1e6 + 0.5).toLong
    }.sum
    (docTokens.size.toLong,
      math.floor(s6 / 1e6 / docTokens.size * 1e4 + 0.5) / 1e4)
  }

  private val lmDocs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
  private val lmCounts = Map("a" -> 2L, "b" -> 2L, "c" -> 1L)

  test("selfScore matches the hand formula exactly") {
    val got = LmScore.selfScore(lmDocs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val w1 = nllExpect(Seq("a", "a", "b"), lmCounts)
    val w2 = nllExpect(Seq("b", "c"), lmCounts)
    assert(got == Seq((1L, w1._1, w1._2), (2L, w2._1, w2._2)), got.toString)
  }

  test("frozen-LM scoring: OOV terms get the smoothed floor, not dropped rows") {
    val lm = LmScore.fitUnigram(lmDocs)
    val got = LmScore.nll(Seq((9L, "zzz zzz")).toDF("doc_id", "text"), lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val w = nllExpect(Seq("zzz", "zzz"), lmCounts)
    assert(got == Seq((9L, w._1, w._2)), got.toString)
  }

  test("nll orders quality: an in-distribution doc scores below a rare-term doc") {
    val docs = (1L to 20L).map(i => (i, "common words common words"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "zxqv bnmp")).toDF("doc_id", "text"))
    val got = LmScore.selfScore(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(1L) < got(99L),
      s"common doc ${got(1L)} must score below rare doc ${got(99L)}")
  }

  test("nllStream (per-token form) is bit-identical to nll (per-term form) on batch") {
    val docs = graft.Engine.Tables(spark, Sf0001).documents
    val lm = LmScore.fitUnigram(docs)
    val a = LmScore.nll(docs, lm).orderBy("doc_id").collect().toSeq
    val b = LmScore.nllStream(docs, lm).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("nllStream refuses an empty LM loudly") {
    val lm = LmScore.fitUnigram(Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val e = intercept[IllegalArgumentException] {
      LmScore.nllStream(lmDocs, lm)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("corpusCard aggregates per source with exact mean and interpolated median") {
    val docs = Seq(
      (1L, "a b c", "en", "web"),    // 3 tok
      (2L, "a b", "en", "web"),      // 2 tok
      (3L, "a b c d e f", "de", "web"), // 6 tok
      (4L, "a", "en", "web"),        // 1 tok -> web: n=4, sum=12, p50=2.5
      (5L, "x y z", "en", "book"),   // book: n=1
      (6L, "   ", "en", "book"))     // empty -> excluded
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.corpusCard(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("book", 1L, 3L, 3.0, 1L, 3.0),
      ("web", 4L, 12L, 3.0, 2L, 2.5)), got.toString)
  }

  test("hybridTopK reranks BM25 candidates by cosine; missing embeddings drop") {
    // docs 1-3 all match "kiwi"; embeddings order docs 3 > 2 by cosine to
    // the query vector, doc 1 has NO embedding and must drop from stage 2
    val docs = Seq((1L, "kiwi a"), (2L, "kiwi b"), (3L, "kiwi c"))
      .toDF("doc_id", "text")
    val qs = Seq((9L, "kiwi")).toDF("qid", "qtext")
    val emb = Seq(
      (9L, Seq(1.0f, 0.0f)),  // query vector
      (2L, Seq(0.6f, 0.8f)),  // cos 0.6
      (3L, Seq(0.8f, 0.6f)))  // cos 0.8 -> must outrank doc 2
      .toDF("vec_id", "embedding")
    val got = Retrieval.hybridTopK(docs, emb, qs, 2, 3).orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == Seq((9L, 3L, 0.8, 1L), (9L, 2L, 0.6, 2L)), got.toString)
    val e = intercept[IllegalArgumentException](
      Retrieval.hybridTopK(docs, emb, qs, 5, 3))
    assert(e.getMessage.contains("kLex"))
  }

  test("fertility ratios come from exact sums, empty docs excluded") {
    val docs = Seq(
      (1L, "ab cd-ef", "web"),   // 8 ch; 2 words; bpeish: ab,cd,-,ef = 4
      (2L, "x9", "web"),         // 2 ch; 1 word; bpeish: x,9 = 2
      (3L, " ", "web"),          // blank -> excluded
      (4L, "hello", "book"))     // 5 ch; 1 word; 1 bpeish
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.fertility(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("book", 5L, 1L, 1L, 5.0, 1.0),
      ("web", 10L, 3L, 6L, 1.6667, 2.0)), got.toString)
  }

  // ---- domainTerms --------------------------------------------------------

  test("domainTerms matches the hand tf*idf exactly; boilerplate idf is 0") {
    val docs = Seq(
      (1L, "apple apple banana", "s1"),
      (2L, "banana cherry cherry", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Retrieval.domainTerms(docs, 2).orderBy("source", "rnk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // n_src=2; apple/cherry in 1 source (idf ln2), banana in both (idf 0)
    val ln2_4 = math.floor(math.floor(math.log(2.0) * 1e6 + 0.5) * 2 / 1e6 * 1e4 + 0.5) / 1e4
    assert(got == Seq(
      ("s1", "apple", 2L, ln2_4, 1L), ("s1", "banana", 1L, 0.0, 2L),
      ("s2", "cherry", 2L, ln2_4, 1L), ("s2", "banana", 1L, 0.0, 2L)),
      got.toString)
  }

  test("domainTerms: k truncates per source, ties break by term, k=0 fails fast") {
    val docs = Seq((1L, "b a", "s1")).toDF("doc_id", "text", "source")
    // both terms tf=1, idf ln(1)=0 -> tied at 0; term asc breaks the tie
    val got = Retrieval.domainTerms(docs, 1).collect()
      .map(r => (r.getString(1), r.getLong(4))).toSeq
    assert(got == Seq(("a", 1L)), got.toString)
    val e = intercept[IllegalArgumentException](Retrieval.domainTerms(docs, 0))
    assert(e.getMessage.contains("k must be >= 1"))
  }
}
