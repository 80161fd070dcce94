package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BottomK (bounded k-slot-heap aggregate) equivalence with the
  * unbounded composable form it replaces, plus heap-level unit checks. */
class BottomKSpec extends SparkTestBase {

  test("heap keeps exactly the k smallest, any insertion order") {
    val h = new BottomKHeap(4)
    Seq(9L, 2L, 7L, 7L, -3L, 11L, 0L, 5L).foreach(h.insert)
    assert(h.sortedAscending.toSeq == Seq(-3L, 0L, 2L, 5L))
    val tiny = new BottomKHeap(8)
    Seq(3L, 1L).foreach(tiny.insert)
    assert(tiny.sortedAscending.toSeq == Seq(1L, 3L)) // under-full: all values
  }

  test("bottom_k == slice(sort_array(collect_list), 1, k) over random groups") {
    import spark.implicits._
    // seeded generator: group sizes straddle k (some under-full groups),
    // values include duplicates and negatives
    val rnd = new scala.util.Random(42)
    val rows = (1 to 50).flatMap { g =>
      (0 until rnd.nextInt(40)).map(_ => (g.toLong, rnd.nextLong() % 1000))
    }
    val df = rows.toDF("g", "v")
    val k = 7
    val got = df.groupBy("g").agg(BottomK.bottom_k(col("v"), k).as("bk"))
    val want = df.groupBy("g")
      .agg(slice(sort_array(collect_list(col("v"))), 1, k).as("bk"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("bottom_k survives a shuffle-partitioned two-phase aggregation path") {
    import spark.implicits._
    // many partitions per group forces partial aggregates to serialize,
    // shuffle, and merge — the serialize/deserialize/merge path
    val df = spark.range(0, 10000).select(
      (col("id") % 3).as("g"), xxhash64(col("id")).as("v")).repartition(8)
    val got = df.groupBy("g").agg(BottomK.bottom_k(col("v"), 5).as("bk"))
      .orderBy("g").collect().map(_.getSeq[Long](1))
    val want = df.groupBy("g")
      .agg(slice(sort_array(collect_list(col("v"))), 1, 5).as("bk"))
      .orderBy("g").collect().map(_.getSeq[Long](1))
    assert(got.toSeq.map(_.toSeq) == want.toSeq.map(_.toSeq))
    // the plan must be ObjectHashAggregate (map-side partial agg), not a
    // sort-based fallback
    val plan = df.groupBy("g").agg(BottomK.bottom_k(col("v"), 5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$plan")
  }

  test("property: heap == sorted.take(k) over seeded random value streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val valsGen = Gen.chooseNum(0, 200)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    val kGen = Gen.chooseNum(1, 40)
    (0 until 200).foreach { i =>
      val seed = Seed(i.toLong)
      val vs = valsGen.apply(Gen.Parameters.default, seed).get
      val k = kGen.apply(Gen.Parameters.default, seed.next).get
      val h = new BottomKHeap(k)
      vs.foreach(h.insert)
      assert(h.sortedAscending.toSeq == vs.sorted.take(k),
        s"seed $i k=$k n=${vs.size}")
    }
  }

  test("bottom_k skips nulls like collect_list") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (1L, Some(2L))).toDF("g", "v")
    val got = df.groupBy("g").agg(BottomK.bottom_k(col("v"), 3).as("bk"))
      .head().getSeq[Long](1)
    assert(got.toSeq == Seq(2L, 5L))
  }
}
