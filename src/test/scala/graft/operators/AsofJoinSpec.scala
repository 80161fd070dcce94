package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("asofJoin picks latest right <= left per key; null before any right") {
    val trades = Seq((1L, ts(10), "t1"), (1L, ts(5), "t0"), (2L, ts(10), "t2"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, ts(4), 100.0), (1L, ts(9), 101.0), (1L, ts(11), 102.0),
      (2L, ts(20), 200.0)).toDF("k", "ts", "px")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("k"), "ts", "ts")
      .select(col("trade"), col("asof.px")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("t0") == Some(100.0)) // latest quote <= ts(5) is ts(4)
    assert(out("t1") == Some(101.0)) // ts(9), not ts(11)
    assert(out("t2") == None)        // key 2 has no prior quote
  }

  test("equal timestamps match (ASOF >= semantics)") {
    val l = Seq((1L, ts(5), "x")).toDF("k", "ts", "n")
    val r = Seq((1L, ts(5), 9.0)).toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "ts")
      .select(col("asof.v")).head()
    assert(out.getDouble(0) == 9.0)
  }

  test("equal-timestamp right rows pick deterministically via rightTieCols") {
    import spark.implicits._
    val left = Seq(("k", 10L, "L")).toDF("key", "ts", "lv")
    val right = Seq(("k", 10L, 1L, "A"), ("k", 10L, 2L, "B"))
      .toDF("key", "ts", "rid", "rv")
    (1 to 5).foreach { i =>
      val got = AsofJoin.asofJoin(left, right.repartition(i % 3 + 1),
          Seq("key"), "ts", "ts", rightTieCols = Seq("rid"))
        .select("asof.rv").head().getString(0)
      assert(got == "B", "highest tie column must win deterministically")
    }
  }
}
