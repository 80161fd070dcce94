package graft.operators

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  test("bottom-k reservoir: deterministic and partitioning-independent") {
    val ev = Engine.Tables(spark, Sf0001).events
    def run(parts: Int) =
      Sampling.sampleIdsPerGroup(ev.repartition(parts), Seq("event_type"), "event_id", 10)
        .orderBy("event_type").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val a = run(1)
    val b = run(8)
    assert(a == b, "sample must not depend on physical partitioning")
    assert(a.values.forall(_.size == 10))
    // sampled ids belong to their group
    val byType = ev.select("event_type", "event_id").collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    a.foreach { case (t, ids) => assert(ids.forall(byType(t).contains)) }
  }

  test("bottom-k heap aggregator == sort-based reference over random splits") {
    // property test of the heap buffer against the obvious sort-take-k
    // reference, across random partition splits, merge orders, and an
    // encoder-shaped round-trip (immutable Seq) that forces re-heapify
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(200)
      // small priority range on purpose: exercises (priority, id) ties
      val items = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
      val agg = new Sampling.BottomKPairs(k)
      val partials = items.grouped(1 + rnd.nextInt(7)).map { part =>
        val buf = part.foldLeft(agg.zero)(agg.reduce)
        if (rnd.nextBoolean()) Vector(buf.toSeq: _*) else buf // serialized shape
      }.toSeq
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      val want = items.sorted.take(k).map(_._2)
      assert(got == want, s"trial $trial (k=$k, n=$n): $got != $want")
    }
  }

  test("bottom-k heap with k=0 degrades to an empty sample (no heap read)") {
    // the full-buffer branch must not read h(0) on an empty heap
    val agg = new Sampling.BottomKPairs(0)
    val buf = Seq((1L, 1L), (2L, 2L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(buf, agg.zero)) == Seq.empty,
      "k=0 must yield an empty sample, matching the pre-heap sort-take form")
  }

  test("budgeted take: inclusive cumsum cap, deterministic, nested in budget") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
    def take(b: Long) = Sampling.budgetedTakePerGroup(docs, "source", "doc_id", "n_tok", b)
    val got = take(1000L).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // per-group cum total stays within budget and equals the sum of kept weights
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).max <= 1000L)
      assert(rows.map(_._4).max == rows.map(_._3).sum)
    }
    // nested: the 500-budget selection is a subset of the 1000-budget one
    val small = take(500L).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(got.map(_._2).toSet))
    // partitioning-independent
    assert(Sampling.budgetedTakePerGroup(docs.repartition(13), "source", "doc_id", "n_tok", 1000L)
      .collect().map(_.getLong(0)).toSet == got.map(_._2).toSet)
  }

  test("budgetedTakePerGroup fails fast on non-positive weights (nesting guard)") {
    import spark.implicits._
    // a zero/negative weight makes the cumsum non-monotone: the selection
    // is then not a prefix of the priority order and nesting breaks
    val bad = Seq((1L, "g", 5L), (2L, "g", -3L)).toDF("doc_id", "source", "n_tok")
    val e = intercept[Exception](
      Sampling.budgetedTakePerGroup(bad, "source", "doc_id", "n_tok", 3L).collect())
    assert(e.getMessage.contains("non-positive weight"))
  }

  test("deterministicSamplePpm holds a fit cap that whole-percent flooring cannot") {
    import spark.implicits._
    val n = 200000L
    val ids = spark.range(n).toDF("doc_id")
    // cap = 2000 rows over 200k: ppm = 10000 (1%) -> ~2000 kept; the old
    // whole-percent path would be right here, but at cap*1e6/n < 1e4 the
    // percent floor of 1% keeps n/100 rows regardless of the cap
    val ppm = math.ceil(2000L * 1e6 / n).toInt
    val kept = Sampling.deterministicSamplePpm(ids, "doc_id", ppm).count()
    assert(math.abs(kept - 2000L) < 300L, s"ppm sample kept $kept of target 2000")
    // rate granularity below 1%: 100 ppm over 200k ~ 20 rows
    val fine = Sampling.deterministicSamplePpm(ids, "doc_id", 100).count()
    assert(fine < 60L, s"sub-percent rate must be expressible, kept $fine")
  }

  test("splitByHash: disjoint, exhaustive, growth-stable train/val/test") {
    val ev = Engine.Tables(spark, Sf0001).events
    val split = Sampling.splitByHash(ev, "event_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = ev.count().toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == n.toLong, "splits must be exhaustive")
    assert(math.abs(counts("train") / n - 0.80) < 0.03)
    // growth stability: splitting a subset assigns the same splits
    val sub = Sampling.splitByHash(ev.limit(500), "event_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10)).select("event_id", "split")
    assert(sub.join(split.select(col("event_id"), col("split").as("s2")), "event_id")
      .filter(col("split") =!= col("s2")).count() == 0)
  }

  test("normalize collapses case and whitespace variants to one form") {
    import spark.implicits._
    val df = Seq("Hello   World ", "hello world", " HELLO\tWORLD").toDF("text")
    val forms = df.select(graft.operators.TextAnalysis.normalize(col("text")))
      .distinct().as[String].collect()
    assert(forms.toSeq == Seq("hello world"))
  }

  test("deterministic hash-mod sample: stable, ~p percent, filter pushes down") {
    val ev = Engine.Tables(spark, Sf0001).events
    val s1 = Sampling.deterministicSample(ev, "event_id", 10)
    val s2 = Sampling.deterministicSample(ev, "event_id", 10)
    val n = ev.count().toDouble
    assert(s1.count() == s2.count())
    assert(math.abs(s1.count() / n - 0.10) < 0.03, s"got ${s1.count() / n}")
    // supersets: 10% sample is contained in the 20% sample (nested samples)
    val s20 = Sampling.deterministicSample(ev, "event_id", 20)
    assert(s1.join(s20, Seq("event_id"), "left_anti").count() == 0)
  }

  test("PPS weighted sample: deterministic, partitioning-independent, weight-biased, TakeOrdered plan") {
    val docs = Engine.Tables(spark, Sf0001).documents
    def ids(parts: Int) =
      Sampling.ppsSample(docs.repartition(parts), "doc_id", "n_chars", 50)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(1)
    val b = ids(7)
    assert(a == b && a.size == 50, "PPS sample must not depend on partitioning")
    // inclusion probability tracks weight: the sampled docs' mean length
    // must exceed the corpus mean (docs weighted by n_chars)
    val all = docs.select(avg("n_chars")).head.getDouble(0)
    val samp = docs.filter(col("doc_id").isInCollection(a))
      .select(avg("n_chars")).head.getDouble(0)
    assert(samp > all, s"weighted sample mean $samp must exceed corpus mean $all")
    // scales as a per-partition partial top-k, not a global sort
    val df = Sampling.ppsSample(docs, "doc_id", "n_chars", 50)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "PPS sample must plan as TakeOrdered")
  }

  test("trainOrder: shards partition the corpus, per-shard ranks contiguous, stable across partitioning") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet").select("doc_id")
    def run(parts: Int) = Sampling.trainOrder(docs.repartition(parts), "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val a = run(1)
    assert(a.map(_._1).distinct.length == a.length, "every doc ordered exactly once")
    assert(a.map(_._2).toSet.subsetOf((0 until 8).toSet))
    // ranks are contiguous 1..n within every shard
    a.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong),
        s"shard $sh ranks not contiguous")
    }
    // deterministic under any input partitioning — the reproducible-export property
    assert(run(13).toSet == a.toSet)
    // the shuffle actually scatters: no shard is a contiguous doc_id range
    val byShard = a.groupBy(_._2).map { case (_, rows) => rows.map(_._1).sorted.toSeq }
    assert(byShard.exists(ids => ids.zip(ids.tail).exists { case (x, y) => y != x + 1 }))
  }

  test("splitByCluster: whole near-dup clusters share a split; singletons match splitByHash") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val pairs = Dedup.jaccardPairs(docs, 3, 0.5)
    val clusters = DupClusters.clusters(pairs)
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val got = Sampling.splitByCluster(docs.select("doc_id"), clusters, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == docs.count(), "every doc gets exactly one split")
    // every cluster is wholly inside one split — the leakage-free property
    val byCluster = clusters.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1).toSeq }
    assert(byCluster.exists(_._2.size > 1), "testdata must contain multi-doc clusters")
    byCluster.foreach { case (c, members) =>
      val ss = members.map(got).distinct
      assert(ss.size == 1, s"cluster $c straddles splits $ss")
    }
    // docs outside any cluster split exactly as splitByHash of their own id
    val clustered = clusters.collect().map(_.getLong(0)).toSet
    val loneIds = got.keySet -- clustered
    val plain = Sampling.splitByHash(loneIds.toSeq.toDF("doc_id"), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    loneIds.foreach(id => assert(got(id) == plain(id)))
  }

  // ---- temperature mix ----------------------------------------------------

  test("temperatureTargets allocates by sqrt weights, capped at group size") {
    import spark.implicits._
    // A: 100 docs (w=10), B: 4 docs (w=2) -> sum_w = 12; budget 60:
    // A = min(100, 60*10/12) = 50, B = min(4, 60*2/12) = 4 (cap binds).
    // Proportional would give B only 60*4/104 ≈ 2 — temperature upsamples it.
    val df = ((1 to 100).map(i => (i.toLong, "A")) ++
      (101 to 104).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val t = Sampling.temperatureTargets(df, "source", 60L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(t == Map("A" -> (100L, 10L, 50L), "B" -> (4L, 2L, 4L)))
  }

  test("temperatureMix is nested across budgets and honors per-group targets") {
    import spark.implicits._
    val df = (1 to 400).map { i =>
      (i.toLong, if (i <= 320) "big" else if (i <= 390) "mid" else "tiny")
    }.toDF("doc_id", "source")
    val small = Sampling.temperatureMix(df, "source", "doc_id", 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.temperatureMix(df, "source", "doc_id", 250L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "smaller budget must select a subset of a larger one")
    val byGroup = Sampling.temperatureMix(df, "source", "doc_id", 100L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Sampling.temperatureTargets(df, "source", 100L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byGroup == targets.filter(_._2 > 0L), s"take must hit targets: $byGroup vs $targets")
  }

  test("temperatureTargets: zero budget selects nothing, singleton group survives") {
    import spark.implicits._
    val df = Seq((1L, "only")).toDF("doc_id", "source")
    assert(Sampling.temperatureTargets(df, "source", 0L).head().getLong(3) == 0L)
    assert(Sampling.temperatureMix(df, "source", "doc_id", 10L).count() == 1L)
  }

  test("guards: null id refused by splitByHash; colliding generated names " +
    "refused; k=0 modSample refused instead of silently empty") {
    import spark.implicits._
    val nulled = Seq(Some(1L), None).toDF("doc_id")
    val e = intercept[Exception] {
      Sampling.splitByHash(nulled, "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)).collect()
    }
    assert(e.getMessage.contains("null id"), e.getMessage)
    // a caller column named like a generated one must be refused, not
    // silently replaced-then-dropped (data loss)
    val clash = Seq((1L, "a", 7)).toDF("doc_id", "source", "rn")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.stratifiedTake(clash, "source", "doc_id", lit(1))
    }
    assert(e2.getMessage.contains("rn"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Sampling.trainOrder(Seq((1L, 2L)).toDF("doc_id", "ord"), "doc_id", 4)
    }
    assert(e3.getMessage.contains("ord"), e3.getMessage)
    // pmod-by-zero would NULL the predicate and silently empty the sample
    val e4 = intercept[IllegalArgumentException] { Sampling.modSample(col("x"), 0) }
    assert(e4.getMessage.contains("k must be >= 1"), e4.getMessage)
    intercept[IllegalArgumentException] {
      Sampling.deterministicSample(nulled, "doc_id", 101)
    }
  }
}
