package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SeqPackSpec extends SparkTestBase {
  import spark.implicits._

  test("packSplit: slices sum to doc tokens; every non-final bin carries exactly the budget") {
    // budget 10, one shard: offsets 0,6,12,15,24 — doc 2 straddles 10,
    // doc 4 straddles 20, doc 5 (25 tokens) spans bins 2..4
    val docs = Seq((1L, 6L), (2L, 6L), (3L, 3L), (4L, 9L), (5L, 25L))
      .toDF("doc_id", "n_tok").withColumn("shard", lit(0L))
    val out = SeqPack.packSplitSharded(docs, "shard", "doc_id", "n_tok", 10L).collect()
    // per-doc slice sums == the doc's token count
    val perDoc = out.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_tok")).sum).toMap
    assert(perDoc == Map(1L -> 6L, 2L -> 6L, 3L -> 3L, 4L -> 9L, 5L -> 25L))
    // per-bin loads: total 49 tokens -> bins 0..3 exactly 10, final bin 9
    val perBin = out.groupBy(_.getAs[Long]("bin"))
      .view.mapValues(_.map(_.getAs[Long]("n_tok")).sum).toMap
    assert(perBin == Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 9L))
    // seg_idx is 0-based and contiguous per doc (doc 5: three slices)
    val doc5 = out.filter(_.getAs[Long]("doc_id") == 5L)
      .map(r => (r.getAs[Long]("seg_idx"), r.getAs[Long]("bin"), r.getAs[Long]("n_tok")))
      .sortBy(_._1).toSeq
    assert(doc5 == Seq((0L, 2L, 6L), (1L, 3L, 10L), (2L, 4L, 9L)))
    // zero-token docs contribute no slice rows
    val withEmpty = docs.union(Seq((6L, 0L)).toDF("doc_id", "n_tok")
      .withColumn("shard", lit(0L)))
    assert(SeqPack.packSplitSharded(withEmpty, "shard", "doc_id", "n_tok", 10L)
      .filter(col("doc_id") === 6L).isEmpty)
  }

  test("output slice count takes tokCol's name; colliding shard/id/tok inputs are rejected") {
    // a caller's token column named anything (here "toks") flows through:
    // the slice count reuses that name, so downstream code keyed on the
    // caller's own column name keeps working at slice grain
    val docs = Seq((1L, 6L), (2L, 25L)).toDF("doc_id", "toks")
      .withColumn("shard", lit(0L))
    val out = SeqPack.packSplitSharded(docs, "shard", "doc_id", "toks", 10L)
    assert(out.columns.toSeq == Seq("shard", "doc_id", "seg_idx", "bin", "toks"))
    assert(out.agg(sum("toks")).head.getLong(0) == 31L)
    // generated-name collisions fail loudly instead of silently shadowing
    def renamed(to: String) = docs.withColumnRenamed("doc_id", to)
    for (bad <- Seq("bin", "seg_idx", "toks"))
      assert(intercept[IllegalArgumentException] {
        SeqPack.packSplitSharded(renamed(bad), "shard", bad, "toks", 10L)
      }.getMessage.contains("collide"), s"idCol=$bad must be rejected")
    assert(intercept[IllegalArgumentException] {
      SeqPack.packSplitSharded(docs.withColumnRenamed("toks", "bin"),
        "shard", "doc_id", "bin", 10L)
    }.getMessage.contains("collide"), "tokCol named 'bin' must be rejected")
    assert(intercept[IllegalArgumentException] {
      SeqPack.pack(docs.withColumnRenamed("toks", "bin"), "doc_id", "bin", 10L)
    }.getMessage.contains("collide"), "pack: tokCol named 'bin' must be rejected")
    assert(intercept[IllegalArgumentException] {
      SeqPack.packSharded(docs.withColumnRenamed("doc_id", "bin"), "shard", "bin", "toks", 10L)
    }.getMessage.contains("collide"), "packSharded: idCol named 'bin' must be rejected")
  }

  test("packing: doc assigned to bin of its first token; bins fill in order") {
    // budget 10: cum-before = 0,6,12,15,24 -> bins 0,0,1,1,2
    val docs = Seq((1L, 6L), (2L, 6L), (3L, 3L), (4L, 9L), (5L, 2L))
      .toDF("doc_id", "n_tok")
    val out = SeqPack.pack(docs, "doc_id", "n_tok", 10L)
      .orderBy("doc_id").select("bin").as[Long].collect()
    assert(out.toSeq == Seq(0L, 0L, 1L, 1L, 2L))
  }

  test("sharded packing == global packing applied per shard; no single-partition sort") {
    val docs = graft.Engine.Tables(spark, Sf0001).documents
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
      .withColumn("shard", col("doc_id") % 4)
    val sharded = SeqPack.packSharded(docs, "shard", "doc_id", "n_tok", 2048L)
    (0L until 4L).foreach { sh =>
      val expect = SeqPack.pack(docs.filter(col("shard") === sh), "doc_id", "n_tok", 2048L)
        .select("doc_id", "bin")
      val got = sharded.filter(col("shard") === sh).select("doc_id", "bin")
      assert(got.except(expect).count() == 0 && expect.except(got).count() == 0,
        s"shard $sh diverged from independent global packing")
    }
    // the scale property itself: the window shuffles by shard, never
    // serializing the corpus through one task
    val plan = sharded.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"sharded packing must not plan a single-partition sort:\n${plan.take(1200)}")
  }

  test("bin token loads sum to the corpus total; bins are contiguous") {
    val docs = graft.Engine.Tables(spark, Sf0001).documents
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val stats = SeqPack.binStats(docs, "doc_id", "n_tok", 2048L).orderBy("bin").collect()
    val total = docs.agg(sum("n_tok")).head().getLong(0)
    assert(stats.map(_.getAs[Long]("tok")).sum == total)
    val bins = stats.map(_.getAs[Long]("bin")).toSeq
    assert(bins == (bins.min to bins.max).toSeq, "bins must be contiguous")
  }

  test("packEfficiency reports bins, totals, and fill fraction per shard") {
    import spark.implicits._
    // concat-then-chunk: a doc belongs to the bin its FIRST token lands in.
    // shard 0: 8-tok doc fills bin 0; the 5-tok doc starts at cum 8 -> bin 1
    // shard 1: one 3-token doc -> one bin
    val docs = Seq((0L, 0L, 8L), (2L, 0L, 5L), (1L, 1L, 3L))
      .toDF("doc_id", "shard", "n_tok")
    val got = SeqPack.packEfficiency(docs, "shard", "doc_id", "n_tok", 8L)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 13L, 0.8125), // 13/16 exact at 4 decimals
      (1L, 1L, 1L, 3L, 0.375)), got.toString)
  }

  test("exportShards refuses duplicate ids within a shard (unstable payload bytes)") {
    import spark.implicits._
    // doc_id 5 twice in shard 0: the concatenation order (and so the
    // exported byte stream) would be nondeterministic — must raise, not
    // silently pick an order. A duplicate id across DIFFERENT shards is
    // fine (each shard orders independently).
    val dup = Seq((5L, 0L, Seq(1, 2)), (5L, 0L, Seq(3)), (7L, 0L, Seq(4)))
      .toDF("doc_id", "shard", "toks")
    val e = intercept[Exception] {
      SeqPack.exportShards(dup, "shard", "doc_id", "toks", 8L).collect()
    }
    assert(e.getMessage.contains("duplicate id within shard"), e.getMessage)
    val ok = Seq((5L, 0L, Seq(1, 2)), (5L, 1L, Seq(3)))
      .toDF("doc_id", "shard", "toks")
    assert(SeqPack.exportShards(ok, "shard", "doc_id", "toks", 8L)
      .collect().length == 2)
    // null ids are refused outright: lag() is null after a null-id row
    // too, so two nulls would silently slip the duplicate guard with
    // orderBy-tied (nondeterministic) offsets
    val nulls = Seq((Option.empty[Long], 0L, Seq(1, 2)),
      (Option.empty[Long], 0L, Seq(3))).toDF("doc_id", "shard", "toks")
    val en = intercept[Exception] {
      SeqPack.exportShards(nulls, "shard", "doc_id", "toks", 8L).collect()
    }
    assert(en.getMessage.contains("null id"), en.getMessage)
  }

  test("every packer refuses duplicate/null ids like the export does; " +
    "split packing filters non-positive counts BEFORE the offset window") {
    import spark.implicits._
    // a duplicate id makes the orderBy-tie running sum order-dependent —
    // the packers were documented deterministic but only the export
    // refused; now the whole family does
    val dup = Seq((0L, 5L, 3L), (0L, 5L, 4L)).toDF("shard", "doc_id", "n_tok")
    val e = intercept[Exception] {
      SeqPack.packSharded(dup, "shard", "doc_id", "n_tok", 8L).collect()
    }
    assert(e.getMessage.contains("duplicate id"), e.getMessage)
    val e2 = intercept[Exception] {
      SeqPack.pack(dup.drop("shard"), "doc_id", "n_tok", 8L).collect()
    }
    assert(e2.getMessage.contains("duplicate id"), e2.getMessage)
    val e3 = intercept[Exception] {
      SeqPack.packSplitSharded(dup, "shard", "doc_id", "n_tok", 8L).collect()
    }
    assert(e3.getMessage.contains("duplicate id"), e3.getMessage)
    // a negative count dropped AFTER the offset window would still shift
    // every later doc's offset (bin ranges double-book); filtering first
    // means doc3 starts exactly where doc1 ended
    val neg = Seq((0L, 1L, 8L), (0L, 2L, -3L), (0L, 3L, 7L))
      .toDF("shard", "doc_id", "n_tok")
    val slices = SeqPack.packSplitSharded(neg, "shard", "doc_id", "n_tok", 10L)
      .orderBy("doc_id", "seg_idx").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))) // (doc, bin, tok)
    assert(slices.toSeq == Seq((1L, 0L, 8L), (3L, 0L, 2L), (3L, 1L, 5L)),
      s"negative-count doc must not shift later offsets: ${slices.toSeq}")
  }
}
