package graft.queries

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Physical-plan properties that matter at the 100 TB design point —
  * asserted so they can't silently regress: filter/column pushdown into the
  * parquet scan, broadcast of dimension tables, no cartesian products in
  * equi-join queries. */
class PlanSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def planOf(df: DataFrame): SparkPlan = df.queryExecution.executedPlan
  private def planString(df: DataFrame): String = planOf(df).toString

  test("q02 filter pushes predicates into the parquet scan") {
    val df = graft.SparkEntry.queries("q02_filter")(spark, Sf0001)
    val s = planString(df)
    assert(s.contains("PushedFilters:") &&
      s.contains("EqualTo(event_type,click)"), s.take(2000))
  }

  test("q01 projection prunes the read schema to selected columns") {
    val df = graft.SparkEntry.queries("q01_project")(spark, Sf0001)
    val scan = planString(df)
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse(scan)
    assert(!readSchema.contains("props") && !readSchema.contains("user_id"),
      s"unpruned columns read: $readSchema")
  }

  test("q13 joins dimension tables via broadcast, no shuffle of nation/region") {
    val df = graft.SparkEntry.queries("q13_join_agg")(spark, Sf0001)
    df.collect() // finalize this QE's adaptive plan in place
    val s = planOf(df).toString
    assert(s.contains("BroadcastHashJoin"), s.take(1500))
    assert(!s.contains("CartesianProduct"))
  }

  test("q14a semi join stays a real semi join (no materialized inner)") {
    val s = planString(graft.SparkEntry.queries("q14a_semi")(spark, Sf0001))
    assert(s.contains("LeftSemi"), s.take(1500))
  }

  test("whole-stage codegen covers the scalar parity queries") {
    Seq("q03_scale_clamp", "q04_time", "q06_classify").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, Sf0001)
      df.collect() // finalize this QE's adaptive plan in place
      val s = planOf(df).toString
      assert(s.contains("WholeStageCodegen") || s.contains("*(1)"), s"$q fell out of codegen: ${s.take(800)}")
    }
  }

  test("fused cosine stays inside whole-stage codegen in the ANN plan") {
    val emb = Engine.Tables(spark, Sf0001).embeddings
    val scored = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(broadcast(emb.select(col("vec_id").as("b"), col("embedding").as("vb"))))
      .select(graft.functions.CosineSim.cosine_sim(col("va"), col("vb")).as("c"))
    scored.collect()
    val s = planOf(scored).toString
    assert(s.contains("WholeStageCodegen") || s.contains("*(1)"), s.take(1500))
  }

  test("qe3b LSH bucketing runs fully codegen'd — no CodegenFallback expressions") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val df = graft.SparkEntry.queries("qe3b_knn_lsh")(spark, Sf0001)
    df.collect() // finalize the adaptive plan in place
    val fallbacks = collect(planOf(df)) { case p =>
      p.expressions.flatMap(_.collect { case e: CodegenFallback => e })
    }.flatten
    assert(fallbacks.isEmpty,
      s"interpreted expressions in the ANN hot path: ${fallbacks.map(_.getClass.getSimpleName).distinct}")
  }

  test("byte-level parser queries run fully codegen'd, one shuffle (the oracle sort)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    Seq("qe5c_image_dims", "qe5d_audio_meta", "qe5e_video_meta",
      "qe5f_media_triage", "qe59_utf8_triage",
      "qe5i_mpeg_audio", "qe5j_avc_sps", "qe5k_aac_adts",
      "qe5l_flac", "qe5m_ogg_opus", "qe5n_compressed_triage",
      "qe5o_vbr_mpeg").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, Sf0001)
      df.collect() // finalize the adaptive plan in place
      val plan = planOf(df)
      val fallbacks = collect(plan) { case p =>
        p.expressions.flatMap(_.collect { case e: CodegenFallback => e })
      }.flatten
      assert(fallbacks.isEmpty, s"$q: interpreted expressions in the ingest " +
        s"hot path: ${fallbacks.map(_.getClass.getSimpleName).distinct}")
      // the construction + parse is a pure projection over the scan; the
      // ONLY exchange is the rangepartitioning the oracle's total ORDER BY
      // demands (absent at production scale, where output stays unsorted)
      val exchanges = collect(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
      assert(exchanges.size <= 1,
        s"$q: expected at most the oracle-sort exchange, got ${exchanges.size}")
    }
  }

  test("qe7b blocked near-dup plans equi-joins only — no BroadcastNestedLoopJoin") {
    val df = graft.SparkEntry.queries("qe7b_embed_neardup_blocked")(spark, Sf0001)
    df.collect() // finalize the adaptive plan in place
    val s = planOf(df).toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"blocked scale path degenerated to a cross product:\n${s.take(1500)}")
  }

  test("bucketed tables co-locate: repeated join runs without a shuffle exchange") {
    // default ./spark-warehouse (warehouse.dir is a static conf); tables
    // dropped below, dir is gitignored
    val t = Engine.Tables(spark, Sf0001)
    t.orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    t.customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(sum("o_totalprice").as("rev"))
    joined.collect()
    val s = planOf(joined).toString
    assert(!s.contains("Exchange hashpartitioning(o_custkey") &&
      !s.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join still shuffles on the join key:\n${s.take(1500)}")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("qe14 repetition stats plan is shuffle-free (per-row array math)") {
    val docs = Engine.Tables(spark, Sf0001).documents
    val df = graft.operators.TextAnalysis.repetitionStats(docs) // no orderBy: the
    // driver's total sort is presentation, the operator itself must not exchange
    df.collect()
    val s = planString(df)
    assert(!s.contains("Exchange"),
      s"repetition stats must be a linear scan with no shuffle:\n${s.take(1500)}")
  }

  test("qe21 segment dedup: two exchanges, min-aggregated (no skew-prone window)") {
    val docs = Engine.Tables(spark, Sf0001).documents
    val df = graft.operators.SegmentDedup.dedupSegments(docs, 8)
    df.collect()
    val s = planString(df)
    // survivor choice must be an aggregate (map-side partial combine), not
    // a row_number window that shuffle-sorts every copy of a hot segment
    // into one partition
    assert(!s.contains("Window"), s"window-based survivor choice:\n${s.take(1500)}")
    assert(s.contains("partial_min"), s"no map-side combine:\n${s.take(1500)}")
    // count exchange NODES in the finalized plan — the AQE plan STRING
    // repeats them in its "== Initial Plan ==" section
    val exchanges = collectWithSubqueries(planOf(df)) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(exchanges <= 2, s"$exchanges exchanges; segment dedup needs only seg + doc_id:\n${s.take(2000)}")
  }

  test("qe22 top n-grams: map-side combine + TakeOrdered, no global sort") {
    val df = graft.operators.TextAnalysis.topNgrams(
      Engine.Tables(spark, Sf0001).documents, 2, 20)
    df.collect()
    val s = planString(df)
    assert(s.contains("partial_count"), s"no map-side combine:\n${s.take(1500)}")
    assert(s.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global Sort+Limit:\n${s.take(1500)}")
  }

  test("qe12b bloom probe filters the corpus scan inside codegen, before any join") {
    val docs = Engine.Tables(spark, Sf0001).documents
    val bench = docs.filter(col("doc_id") % 19 === 3)
    val corpus = docs.filter(col("doc_id") % 19 =!= 3)
    val df = graft.operators.Decontaminate.contaminationBloom(corpus, bench, 5)
    df.collect()
    val s = planString(df)
    val filterLine = s.linesIterator.find(_.contains("bloommightcontain"))
    assert(filterLine.isDefined, s"bloom probe missing from plan:\n${s.take(2000)}")
    // '*(n)' marks whole-stage-codegen'd operators: the probe must not be
    // an interpreted fallback in the corpus-scan hot path
    assert(filterLine.get.trim.matches("^[+:\\-\\s]*\\*\\(\\d+\\).*"),
      s"bloom probe not codegen'd: ${filterLine.get}")
  }

  test("qe17 quantile gate broadcasts the one-row threshold back to the corpus") {
    val df = graft.SparkEntry.queries("qe17_quality_gate")(spark, Sf0001)
    df.collect()
    val s = planString(df)
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s"threshold must come back as a broadcast, not a shuffle:\n${s.take(1500)}")
  }

  test("partitioned writes prune partitions at scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("part_events").toString
    Engine.Tables(spark, Sf0001).events
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("event_type") === "click")
    df.collect()
    val s = planString(df)
    val scanLine = s.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("event_type"),
      s"partition filter must prune at the scan, plan:\n${s.take(1500)}")
    // the predicate is satisfied ENTIRELY by pruning: no data filter remains
    assert(!s.contains("PushedFilters: [IsNotNull(event_type)"),
      "partition column predicates must not degrade to row-level filters")
  }

  test("qe22 adjunct: count-min sketch token counts within epsilon of exact (mergeable at scale)") {
    // the sketch form of heavy-hitter counting: at 100 TB a count-min
    // sketch merges associatively across partitions in O(sketch) memory
    // where the exact groupBy shuffles the full vocabulary; here we pin
    // Spark's built-in CMS against exact counts within its declared eps*N
    val docs = Engine.Tables(spark, Sf0001).documents
    val toks = docs.select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
    val exact = toks.groupBy("t").count().orderBy(desc("count"), col("t"))
      .limit(20).collect().map(r => r.getString(0) -> r.getLong(1))
    val n = toks.count()
    val eps = 0.001
    val cms = toks.stat.countMinSketch(col("t"), eps = eps, confidence = 0.99, seed = 42)
    exact.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"CMS must never undercount: $t exact=$c est=$est")
      assert(est <= c + (eps * n).toLong,
        s"CMS overcount beyond eps*N: $t exact=$c est=$est n=$n")
    }
  }

  test("Q12 adjunct: approx_count_distinct within 5% of exact (HLL)") {
    val ev = Engine.Tables(spark, Sf0001).events
    val rows = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    rows.foreach { r =>
      val (e, a) = (r.getAs[Long]("exact").toDouble, r.getAs[Long]("approx").toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("qe28 BM25: partial top-k before the shuffle, slice materialized once") {
    val df = graft.SparkEntry.queries("qe28_bm25")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    // per-query top-k must not funnel full candidate lists through one
    // task: Spark's InferWindowGroupLimit plants a Partial limit map-side
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"),
      s"rank window not rewritten to WindowGroupLimit:\n${s.take(2000)}")
    // the scoring branch must consume the ONE materialized postings slice
    // (localCheckpoint), not re-tokenize the corpus per consumer
    assert(s.contains("Scan ExistingRDD"),
      s"postings slice not materialized once:\n${s.take(2000)}")
    // df/qterms/qid joins all broadcast; nothing falls to a cartesian
    assert(s.contains("BroadcastHashJoin") && !s.contains("CartesianProduct"))
  }

  test("qe29 LM scoring: term join is NOT broadcast-pinned (vocab may exceed driver)") {
    val df = graft.SparkEntry.queries("qe29_lm_nll")(spark, Sf0001)
    val lp = df.queryExecution.optimizedPlan.toString
    // the lm-frame join must stay eligible for a shuffle join at scale: no
    // explicit broadcast hint on the vocab side (AQE may still choose to
    // broadcast a small fitted vocab at runtime — that's the point). Only
    // the 1-row totals cross join is hint-pinned.
    val termJoin = lp.linesIterator.filter(_.contains("Join LeftOuter")).mkString("\n")
    assert(termJoin.nonEmpty, s"expected the lm left join in:\n${lp.take(2000)}")
    assert(!termJoin.contains("strategy=broadcast"),
      s"vocab join must not be broadcast-pinned:\n$termJoin")
  }

  test("qe32 domain terms: partial top-k map-side; source-frequency join not broadcast-pinned") {
    val df = graft.SparkEntry.queries("qe32_domain_terms")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    // per-source top-k must limit before the shuffle, never a global sort
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"),
      s"rank window not rewritten to WindowGroupLimit:\n${s.take(2000)}")
    assert(!s.contains("CartesianProduct"))
    // the df_s frame is vocab-sized — it must stay eligible for a shuffle
    // join at scale (no explicit broadcast hint; AQE may still pick one)
    val lp = df.queryExecution.optimizedPlan.toString
    val dfsJoin = lp.linesIterator.filter(l =>
      l.contains("Join Inner") && !l.contains("strategy=broadcast")).mkString
    assert(dfsJoin.nonEmpty,
      s"expected an unpinned inner join for the df_s frame:\n${lp.take(2000)}")
  }

  test("qe26b split leakage: both sides corpus-sized — no broadcast pin, no cartesian") {
    val df = graft.SparkEntry.queries("qe26b_split_leakage")(spark, Sf0001)
    val lp = df.queryExecution.optimizedPlan.toString
    // the test-shingle vs train-shingle join must not be broadcast-pinned:
    // at scale BOTH sides are corpus-sized (AQE can still pick a broadcast
    // when the train slice fits — that's runtime's call, not the plan's)
    val leakJoin = lp.linesIterator.filter(_.contains("Join LeftOuter")).mkString("\n")
    assert(leakJoin.nonEmpty, s"expected the leakage left join in:\n${lp.take(2000)}")
    assert(!leakJoin.contains("strategy=broadcast"),
      s"leakage join must not be broadcast-pinned:\n$leakJoin")
    df.collect()
    assert(!planOf(df).toString.contains("CartesianProduct"))
  }

  test("qe33 pipeline: equi-joins only, one benchmark broadcast, sharded window (no global sort)") {
    val df = graft.SparkEntry.queries("qe33_pipeline")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s.take(2000))
    // the decontamination probe broadcasts the benchmark shingle set
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    // packing runs as a PARTITIONED window (per-source shards): a global-
    // order window would shuffle everything into ONE task via an
    // `Exchange SinglePartition` — the scale-killer this pin guards against
    assert(!s.contains("SinglePartition"),
      s"single-task exchange in the pipeline plan:\n${s.take(2000)}")
  }

  test("qe38 stopword ratio: stopword list broadcasts; fit is TakeOrdered, never a global sort") {
    val df = graft.SparkEntry.queries("qe38_stopword_ratio")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    // the frozen top-k stopword list rides the corpus pass as a broadcast
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    // top-k by df must be TakeOrdered (partial per partition), not a full
    // sort of the vocabulary
    assert(s.contains("TakeOrderedAndProject"), s.take(2000))
  }

  test("qe39 zscore gate: per-group stats broadcast back; corpus never shuffles for apply") {
    val df = graft.SparkEntry.queries("qe39_zscore_gate")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"),
      s"apply side must not shuffle the corpus into a merge join:\n${s.take(2000)}")
  }

  test("qe40 gated pipeline: equi-joins only, stats broadcast, no single-partition exchange") {
    val df = graft.SparkEntry.queries("qe40_pipeline_gated")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s.take(2000))
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SinglePartition"),
      s"single-task exchange in the gated pipeline plan:\n${s.take(2000)}")
  }

  test("qe3d frozen IVF: no k-means fit in the executed plan (no ScalaUDF), no cartesian") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    // contrast pin: the inline-fit form (qe3c) assigns cells through the
    // fitted MLlib model's prediction UDF — that is exactly what the frozen
    // form must NOT contain
    val inline = graft.SparkEntry.queries("qe3c_knn_ivf")(spark, Sf0001)
    inline.collect()
    val inlineUdfs = collectWithSubqueries(planOf(inline)) { case p =>
      p.expressions.flatMap(_.collect { case e: ScalaUDF => e })
    }.flatten
    assert(inlineUdfs.nonEmpty,
      "expected the inline-fit plan to carry the model's prediction UDF — " +
        "if MLlib stopped planning a UDF, re-derive this pin")
    val df = graft.SparkEntry.queries("qe3d_knn_ivf_frozen")(spark, Sf0001)
    df.collect()
    val udfs = collectWithSubqueries(planOf(df)) { case p =>
      p.expressions.flatMap(_.collect { case e: ScalaUDF => e })
    }.flatten
    assert(udfs.isEmpty,
      s"frozen apply plan must be UDF-free (no fit, no model transform): " +
        s"${udfs.map(_.udfName).mkString(",")}")
    val s = planOf(df).toString
    assert(!s.contains("CartesianProduct"), s.take(2000))
    // the map-only assignment must ride whole-stage codegen end to end:
    // no interpreted fallback expressions anywhere in the frozen ANN plan
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val fallbacks = collect(planOf(df)) { case p =>
      p.expressions.flatMap(_.collect { case e: CodegenFallback => e })
    }.flatten
    assert(fallbacks.isEmpty,
      s"interpreted expressions in the frozen ANN path: ${fallbacks.map(_.getClass.getSimpleName).distinct}")
  }

  test("qe11e shard export (warm): the served plan is the artifact scan, not the packer") {
    // first invocation fits + persists the shard table; every later one
    // must recompute the manifest FROM THE PARQUET READ-BACK — a scan +
    // projection + the oracle sort, with the window/groupBy packing
    // lineage nowhere in the executed plan
    val warmup = graft.SparkEntry.queries("qe11e_shard_export")(spark, Sf0001)
    warmup.collect()
    val df = graft.SparkEntry.queries("qe11e_shard_export")(spark, Sf0001)
    df.collect()
    val plan = planOf(df)
    val s = plan.toString
    assert(s.toLowerCase.contains("parquet"), s.take(1500))
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "packing window leaked into the apply plan")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(exchanges.size <= 1,
      s"expected at most the oracle-sort exchange, got ${exchanges.size}")
  }

  test("qe7d frozen SemDeDup: no k-means fit in the executed plan (no ScalaUDF)") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val df = graft.SparkEntry.queries("qe7d_semantic_dedup_frozen")(spark, Sf0001)
    df.collect()
    val udfs = collectWithSubqueries(planOf(df)) { case p =>
      p.expressions.flatMap(_.collect { case e: ScalaUDF => e })
    }.flatten
    assert(udfs.isEmpty,
      s"frozen SemDeDup plan must be UDF-free: ${udfs.map(_.udfName).mkString(",")}")
    assert(!planOf(df).toString.contains("CartesianProduct"))
  }

  test("qe44 boilerplate strip: anti join on the small df-filtered set, no cartesian, min-agg reassembly") {
    val df = graft.SparkEntry.queries("qe44_boilerplate")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    assert(s.contains("LeftAnti"), s"boilerplate removal must plan as an anti join:\n${s.take(1500)}")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s.take(1500))
    // survivor reassembly is an aggregate, not a window
    assert(!s.contains("Window"), s"window in the reassembly plan:\n${s.take(1500)}")
  }

  test("qe46 cluster split: equi-joins only, split projection adds no extra exchange") {
    val df = graft.SparkEntry.queries("qe46_cluster_split")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"cluster split degenerated to a cross product:\n${s.take(2000)}")
    assert(!s.contains("SinglePartition"),
      s"single-task exchange in the split plan:\n${s.take(2000)}")
  }

  test("qe35 knn: labeled side broadcasts over the query scan, top-k prunes map-side") {
    val df = graft.SparkEntry.queries("qe35_knn_label")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    assert(s.contains("BroadcastNestedLoopJoin"), s.take(2000))
    assert(s.contains("WindowGroupLimit"), s.take(2000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("qe50 tfidf: idf broadcasts onto tf, top-k prunes map-side, exact long math") {
    val df = graft.SparkEntry.queries("qe50_tfidf")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    // the corpus-sized tf frame must not re-shuffle for the idf join
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"),
      s"rank window not rewritten to WindowGroupLimit:\n${s.take(2000)}")
    assert(!s.contains("CartesianProduct"), s.take(2000))
    // ratio-idf is long multiply/divide only — a ScalaUDF or a double in
    // the score would break bit-exact cross-engine ranking
    assert(!s.contains("ScalaUDF"), s.take(2000))
  }

  test("qe52 dup spans: 8-byte-key equi-joins only, window-free fold, bounded exchanges") {
    val df = graft.SparkEntry.queries("qe52_dup_spans")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    // the flag join must be an equi-join — a BNLJ/Cartesian here is
    // quadratic in corpus windows
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s.take(2000))
    assert(!s.contains("ScalaUDF"), s.take(2000))
    // span merge is the aggregate-HOF fold, NOT a gaps-and-islands
    // row_number window — no per-doc window exchange in the plan
    assert(!s.contains("Window"), s"window-based span merge:\n${s.take(2000)}")
    // occurrence count, flag-join re-key, per-doc aggregate, final sort:
    // the corpus-window relation must not shuffle more than that
    val exchanges = collectWithSubqueries(planOf(df)) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(exchanges <= 4, s"$exchanges exchanges in the dup-span plan:\n${s.take(2000)}")
  }

  test("qe52b frozen dup spans: apply side is window-free and fit-free (gram set is an input)") {
    val docs = Engine.Tables(spark, Sf0001).documents
    // freeze the gram set first — the APPLY plan is what ships at 100 TB
    val grams = graft.operators.Dedup.dupGramFit(docs, 3).localCheckpoint()
    val df = graft.operators.Dedup.dupSpansFrozen(docs, grams, 3)
    df.collect()
    val s = planOf(df).toString
    assert(!s.contains("Window"), s"window in the frozen apply plan:\n${s.take(2000)}")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s.take(2000))
    assert(!s.contains("ScalaUDF"), s.take(2000))
    // flag join re-key + per-doc aggregate: two corpus shuffles, no more
    val exchanges = collectWithSubqueries(planOf(df)) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(exchanges <= 2, s"$exchanges exchanges in the frozen dup-span apply plan:\n${s.take(2000)}")
  }

  test("qe55 best survivor: argmax is max(struct) aggregation — no per-cluster window, no UDF") {
    val docs = Engine.Tables(spark, Sf0001).documents
    val members = graft.operators.DupClusters.clusters(
      graft.operators.Dedup.jaccardPairs(docs, 3, 0.5)).localCheckpoint()
    val quality = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.tokenCount(col("text")).as("q"))
    val df = graft.operators.DupClusters.survivorsByQuality(members, quality, "q")
    df.collect()
    val s = planOf(df).toString
    // a row_number window would shuffle-sort every copy of a hot cluster
    // into one partition; the max(struct) argmax combines map-side
    assert(!s.contains("Window"), s"window-based survivor argmax:\n${s.take(1500)}")
    assert(s.contains("partial_max"), s"no map-side combine:\n${s.take(1500)}")
    assert(!s.contains("ScalaUDF") && !s.contains("CartesianProduct"), s.take(1500))
  }

  test("qe56 CDC chunking is a shuffle-free per-row explode") {
    val docs = Engine.Tables(spark, Sf0001).documents
    val df = graft.operators.TextAnalysis.chunkCdc(docs, 16) // no orderBy:
    // the registered sort is presentation; the operator itself must not exchange
    df.collect()
    val s = planString(df)
    assert(!s.contains("Exchange"),
      s"CDC chunking must be a linear scan with no shuffle:\n${s.take(1500)}")
    assert(!s.contains("ScalaUDF"), s.take(1500))
  }

  test("qe54 drift card: vocab broadcasts onto the token scan; no window, no UDF") {
    val df = graft.SparkEntry.queries("qe54_source_drift")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    // the k-row vocab (and its one-row mass) must come back as broadcasts,
    // never shuffle joins against the exploded corpus
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("Window") && !s.contains("ScalaUDF"), s.take(2000))
    // the one-row vocab-mass crossJoin is a broadcast NLJ by design; a
    // CartesianProduct would mean the broadcast was lost
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("qe57 exact diversity has no Expand; qe57b HLL card shuffles once") {
    val docs = Engine.Tables(spark, Sf0001).documents
    val exact = graft.operators.TextAnalysis.lexicalDiversity(docs)
    exact.collect()
    val se = planOf(exact).toString
    // two-level aggregation, not count(distinct)'s Expand rewrite
    assert(!se.contains("Expand"), s"Expand in the exact diversity plan:\n${se.take(1500)}")
    val approx = graft.operators.TextAnalysis.lexicalDiversityApprox(docs)
    approx.collect()
    val exchanges = collectWithSubqueries(planOf(approx)) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(exchanges <= 1,
      s"$exchanges exchanges — the HLL card must not shuffle the vocabulary:\n${planOf(approx).toString.take(1500)}")
  }

  test("qe56b/qe58/qe58b reuse signals: hash-key equi-joins only, no window, no UDF") {
    val docs = Engine.Tables(spark, Sf0001).documents
    for ((name, df) <- Seq(
        ("qe56b", graft.operators.Dedup.cdcDupCard(docs, 16)),
        ("qe56c", graft.operators.Dedup.cdcDupCardFrozen(docs,
          graft.operators.Dedup.cdcSharedFit(docs, 16).localCheckpoint(), 16)),
        ("qe58", graft.operators.Dedup.containmentPairs(docs, 3, 0.5)),
        ("qe58b", graft.operators.Dedup.containmentCandidates(docs, 3, 64, 0.3)),
        ("qe58c", graft.operators.Dedup.containmentAgreement(docs, 3, 64, 0.5)),
        ("qe58d", graft.operators.Dedup.containmentFrozenAgreement(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0), 3, 64, 0.5)))) {
      df.collect()
      val s = planOf(df).toString
      // every join in the reuse family keys on an 8-byte or 32-hex hash —
      // a BNLJ/Cartesian would be quadratic in corpus chunks/shingles
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s"$name: non-equi join:\n${s.take(1500)}")
      assert(!s.contains("Window"), s"$name: window in the plan:\n${s.take(1500)}")
      assert(!s.contains("ScalaUDF"), s"$name: UDF in the plan:\n${s.take(1500)}")
    }
  }

  test("qe58d frozen apply: probe derivation is shuffle-free (join + hit-count exchanges only)") {
    val docs = Engine.Tables(spark, Sf0001).documents
    val idx = graft.operators.Dedup.containmentIndexFit(
      docs.filter(col("doc_id") % 2 === 0), 3).localCheckpoint()
    val df = graft.operators.Dedup.containmentCandidatesFrozen(
      docs.filter(col("doc_id") % 2 === 1), idx, 3, 64, 0.5)
    df.collect()
    val plan = planOf(df)
    val s = plan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin")
      && !s.contains("Window") && !s.contains("ScalaUDF"), s.take(2000))
    // the row-wise sketch claim, pinned: the ONLY shuffles are the probe
    // join's two key exchanges and the (da, db) hit-count aggregation —
    // no aggregation exchange exists before the join (the exploded-
    // relation form pays one there)
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(exchanges <= 3, s"$exchanges exchanges in the frozen apply plan:\n${s.take(2000)}")
  }

  test("qe53 temperature mix: tiny targets broadcast back; corpus takes one window shuffle") {
    val df = graft.SparkEntry.queries("qe53_temperature_mix")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    // the per-source target table must come back as a broadcast, never a
    // shuffle join against the corpus
    assert(s.contains("BroadcastExchange"), s.take(2000))
    assert(!s.contains("CartesianProduct") && !s.contains("ScalaUDF"), s.take(2000))
  }

  test("qe51 zorder card: pure bitwise codegen projection, no UDF, bounded exchanges") {
    val df = graft.SparkEntry.queries("qe51_zorder_card")(spark, Sf0001)
    df.collect()
    val s = planOf(df).toString
    assert(!s.contains("ScalaUDF") && !s.contains("CartesianProduct"), s.take(2000))
    assert(s.contains("WholeStageCodegen") || s.contains("*(1)"),
      s"interleave fell out of codegen:\n${s.take(2000)}")
    // min/max fit + bucket aggregate only — the corpus scans once per side
    val exchanges = collectWithSubqueries(planOf(df)) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(exchanges <= 3, s"$exchanges exchanges in the z-order card plan:\n${s.take(2000)}")
  }
}
