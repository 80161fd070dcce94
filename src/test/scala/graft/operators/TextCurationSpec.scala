package graft.operators

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.functions._

/** Round-7 curation operators: segment-level dedup, corpus n-gram stats,
  * bloom decontamination, PII scrub. */
class TextCurationSpec extends SparkTestBase {
  import spark.implicits._

  // ---- SegmentDedup --------------------------------------------------------

  test("segment dedup keeps first occurrence by (doc_id, position), drops claimed spans") {
    val docs = Seq(
      (1L, "a b c d"), // segs (w=2): [a b][c d] — both first
      (2L, "a b x y"), // [a b] claimed by doc 1 -> only [x y] survives
      (3L, "c d")      // fully claimed -> doc disappears
    ).toDF("doc_id", "text")
    val got = SegmentDedup.dedupSegments(docs, 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a b c d", 2L), (2L, "x y", 1L)))
  }

  test("segment dedup collapses intra-doc repeats and keeps a short tail chunk") {
    val docs = Seq((7L, "p q p q r")).toDF("doc_id", "text") // [p q][p q][r]
    val got = SegmentDedup.dedupSegments(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((7L, "p q r", 2L)))
  }

  test("segment dedup is partitioning-independent on the corpus") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    def m(parts: Int) = SegmentDedup.dedupSegments(docs.repartition(parts), 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m(1) == m(13))
  }

  test("segment dedup conserves segments: kept == distinct, dropped == duplicates") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val segs = SegmentDedup.segments(docs, 8)
    val kept = SegmentDedup.dedupSegments(docs, 8)
      .agg(sum("n_segs_kept")).head().getLong(0)
    assert(kept == segs.select("seg").distinct().count(),
      "exactly one survivor per distinct segment")
    assert(kept < segs.count(), "the corpus must actually contain duplicate spans")
  }

  test("boilerplate strip removes ALL occurrences of high-df segments, keeps the rest") {
    val docs = Seq(
      (1L, "nav bar a b"),   // segs (w=2): [nav bar][a b]
      (2L, "nav bar c d"),
      (3L, "nav bar e f"),   // [nav bar] df=3 -> boilerplate everywhere
      (4L, "a b g h")        // [a b] df=2 -> below threshold, stays
    ).toDF("doc_id", "text")
    val got = SegmentDedup.removeBoilerplate(docs, 2, 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a b", 1L), (2L, "c d", 1L), (3L, "e f", 1L),
      (4L, "a b g h", 2L)),
      s"got ${got.toSeq}")
  }

  test("boilerplate strip on the corpus: only >=minDocs segments vanish, no doc gains text") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val segs = SegmentDedup.segments(docs, 8)
    val boilerSegs = segs.groupBy("seg").agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 3).collect().map(_.getString(0)).toSet
    assert(boilerSegs.nonEmpty, "testdata must contain >=3-doc boilerplate at w=8")
    val out = SegmentDedup.removeBoilerplate(docs, 8, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // kept segment count = all segments minus boilerplate occurrences
    val boilerOcc = segs.filter(col("seg").isInCollection(boilerSegs)).count()
    assert(out.map(_._3).sum == segs.count() - boilerOcc)
    // no surviving text contains a boilerplate segment at a chunk boundary
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, clean, _) =>
      assert(clean.nonEmpty, "empty documents must vanish, not emit")
      assert(clean.length <= orig(id).length, s"doc $id grew")
    }
  }

  test("boilerplate fit/apply: the frozen set round-trips parquet and reproduces the inline strip") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val want = SegmentDedup.removeBoilerplate(docs, 8, 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // the apply side must need only an ordinary table, never the fit lineage
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    SegmentDedup.fitBoilerplate(docs, 8, 3).write.mode("overwrite").parquet(dir)
    val got = SegmentDedup.stripBoilerplateFrozen(docs, spark.read.parquet(dir), 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == want)
    // the per-row literal-set apply (the stream-composable twin) must emit
    // byte-identical rows to the join form
    val boiler = spark.read.parquet(dir).collect().map(_.getString(0)).toSeq
    val inline = SegmentDedup.stripBoilerplateInline(docs, boiler, 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(inline == want, "stripBoilerplateInline diverged from the frozen join form")
  }

  // ---- topNgrams -----------------------------------------------------------

  test("top n-grams counts every occurrence, orders by cnt desc then gram") {
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: "a b" x2, "b a", "b c"
      (2L, "a b"),       // "a b"
      (3L, "z")          // too short for a bigram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(docs, 2, 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("top n-grams at n=1 equals plain word frequency") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val viaOp = TextAnalysis.topNgrams(docs, 1, 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val viaSql = docs.filter(length(trim(col("text"))) > 0)
      .select(explode(TextAnalysis.tokens(col("text"))).as("gram"))
      .groupBy("gram").agg(count("*").as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaOp.toSeq == viaSql.toSeq)
  }

  // ---- contaminationBloom --------------------------------------------------

  test("bloom decontamination == exact decontamination on the corpus") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val bench = docs.filter(col("doc_id") % 19 === 3)
    val corpus = docs.filter(col("doc_id") % 19 =!= 3)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = m(Decontaminate.contamination(corpus, bench, 5))
    // identical even at an absurd fpp: the verify join removes every false
    // positive, so fpp only moves cost, never results
    assert(m(Decontaminate.contaminationBloom(corpus, bench, 5)) == exact)
    assert(m(Decontaminate.contaminationBloom(corpus, bench, 5, fpp = 0.5)) == exact)
  }

  test("bloom probe expression agrees with the sketch across eval paths") {
    import graft.functions.BloomMightContain.bloom_might_contain
    val vals = spark.range(1000).select(concat(lit("s"), col("id")).as("s"))
    val bloom = vals.stat.bloomFilter("s", 1000, 0.03)
    // no false negatives: every inserted value must probe true
    assert(vals.filter(!bloom_might_contain(col("s"), bloom)).count() == 0)
    // nulls propagate (nullSafeEval path)
    val withNull = Seq(Some("s1"), None).toDF("s")
    assert(withNull.select(bloom_might_contain(col("s"), bloom).as("p"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      == Seq(true, null))
  }

  // ---- EmbedQuality --------------------------------------------------------

  test("centroid of a group is the element-wise quantized mean; outliers flag below threshold") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(-1.0f, 0.0f), 0), // centroid of label 0 = (0, 1/3)
      (4L, Seq(0.0f, -1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cents = EmbedQuality.centroids(emb).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents(0) == Seq(0.0, 1000000.0 / 3e6)) // quantized mean of (0,1,0)
    assert(cents(1) == Seq(0.0, -1.0))
    val got = EmbedQuality.centroidOutliers(emb, 0.0).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    // cos(v1, (0, 0.333333)) = 0 -> not an outlier at th 0.0 (strict <)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got(1)._2 == 1.0 && got(1)._3 == 0) // v2 parallel to centroid
    assert(got(3)._2 == 1.0 && got(3)._3 == 0) // singleton group: self-centroid
  }

  test("centroid aggregation is partitioning-independent (exact integer sums)") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    def m(parts: Int) = EmbedQuality.centroidOutliers(emb.repartition(parts), 0.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(m(1) == m(17), "a double mean would diverge here; scaled-long sums cannot")
  }

  test("null, empty, and zero-norm embeddings are excluded from centroids and scoring") {
    val emb = Seq(
      (1L, Some(Seq(1.0f, 0.0f)), 0),
      (2L, None: Option[Seq[Float]], 0),
      (3L, Some(Seq.empty[Float]), 0),
      (4L, Some(Seq(0.0f, 0.0f)), 0) // zero norm: no direction, would throw
    ).toDF("vec_id", "embedding", "label")
    val got = EmbedQuality.centroidOutliers(emb, 0.0).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("a group whose centroid cancels to zero norm is dropped, not crashed") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(-1.0f, 0.0f), 0), // cancel -> zero centroid
      (3L, Seq(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbedQuality.centroidOutliers(emb, 0.0).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.toSeq == Seq((3L, 1.0)), "label 0 has no scorable direction")
  }

  test("mixed embedding widths fail fast instead of nulling scores") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val thrown = intercept[Exception] {
      EmbedQuality.centroidOutliers(emb, 0.0).collect()
    }
    assert(thrown.getMessage.contains("dim mismatch"),
      s"expected dim-mismatch, got: ${thrown.getMessage.take(300)}")
  }

  // ---- piiScrub ------------------------------------------------------------

  test("PII scrub redacts emails, IPs, and phones with typed placeholders") {
    val docs = Seq(
      (1L, "mail bob.smith+x@ex-ample.org now"),
      (2L, "host 10.0.255.1 down"),
      (3L, "call +1 (555) 123-4567 today"),
      (4L, "clean text stays untouched"),
      (5L, "two a@b.co c@d.io hits")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "mail <EMAIL> now", 1L),
      (2L, "host <IP> down", 1L),
      (3L, "call <PHONE> today", 1L),
      (4L, "clean text stays untouched", 0L),
      (5L, "two <EMAIL> <EMAIL> hits", 2L)))
  }

  test("PII scrub counts stage-wise: digits inside an email are not re-counted as phone") {
    val docs = Seq((1L, "reach 12345678901@example.com ok")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("reach <EMAIL> ok", 1L)))
  }

  test("PII scrub is the identity on the synthetic corpus (what qe23 pins)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = TextAnalysis.piiScrub(docs).join(docs.select("doc_id", "text"), "doc_id")
    assert(out.filter(col("n_redactions") =!= 0L || col("text_clean") =!= col("text")).count() == 0)
    assert(out.count() == docs.count())
  }

  // ---- tfidfTopK -----------------------------------------------------------

  test("tfidf ranks rare-and-frequent terms first with exact ratio-idf scores") {
    val docs = Seq(
      (1L, "apple banana apple"),  // apple tf=2 df=1; banana tf=1 df=3
      (2L, "banana cherry"),       // cherry tf=1 df=2
      (3L, "cherry banana banana")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, 5).orderBy("doc_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // score_ppm = tf * 1e6 * N div df with N = 3
    assert(got.toSeq == Seq(
      (1L, "apple", 2L, 6000000L, 1L), (1L, "banana", 1L, 1000000L, 2L),
      (2L, "cherry", 1L, 1500000L, 1L), (2L, "banana", 1L, 1000000L, 2L),
      (3L, "banana", 2L, 2000000L, 1L), (3L, "cherry", 1L, 1500000L, 2L)))
  }

  test("tfidf breaks score ties on the word and truncates to k") {
    val docs = Seq((1L, "y x z"), (2L, "x y z")).toDF("doc_id", "text")
    // every term: tf=1, df=2 -> all scores equal -> rank by word asc
    val all = TextAnalysis.tfidfTopK(docs, 5).orderBy("doc_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    assert(all.toSeq == Seq(
      (1L, "x", 1L), (1L, "y", 2L), (1L, "z", 3L),
      (2L, "x", 1L), (2L, "y", 2L), (2L, "z", 3L)))
    val top1 = TextAnalysis.tfidfTopK(docs, 1).collect()
    assert(top1.length == 2 && top1.forall(_.getString(1) == "x"))
  }

  test("tfidf skips empty docs and N counts only tokenized docs") {
    val docs = Seq((1L, "solo"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // N = 1 (docs 2 and 3 never tokenize) -> solo: 1 * 1e6 * 1 / 1
    assert(got.toSeq == Seq((1L, "solo", 1000000L)))
  }
}
