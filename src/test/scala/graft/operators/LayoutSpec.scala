package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout operators: Morton interleave correctness against a
  * bit-by-bit reference, the per-bucket rectangle bound the data-skipping
  * card promises, and the non-overlapping z-ranges of the writer shape. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Bit-by-bit Morton reference: x on even positions, y on odd. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder2 matches the bit-by-bit reference on seeded random 16-bit pairs") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L), (1L, 2L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"zorder2($x, $y) = $z != ${mortonRef(x, y)}")
    }
  }

  test("zorder2 only widens: low 16 bits of each dim, ignores higher bits") {
    val got = Seq((65536L + 5L, (1L << 20) + 7L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"))).head().getLong(0)
    assert(got == mortonRef(5L, 7L), "high bits must be masked, not interleaved")
  }

  test("zorderCard buckets are 2^13-wide rectangles at bits=6 and conserve rows") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(4000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val card = Layout.zorderCard(pts.toDF("x", "y"), "x", "y", 6).collect()
    // top 6 z-bits pin the top 3 bits of EACH dim -> every bucket's raw
    // extent is at most one 8192x8192 cell in either dimension
    card.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 8192L,
        s"bucket ${r.getAs[Int]("bucket")} x-extent breaks the cell bound")
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < 8192L,
        s"bucket ${r.getAs[Int]("bucket")} y-extent breaks the cell bound")
    }
    assert(card.map(_.getAs[Long]("n")).sum == 4000L, "card must conserve rows")
    assert(card.length > 32, "uniform points must spread over most of the 64 cells")
  }

  test("zOrdered write shape: partition z-ranges are sorted and non-overlapping") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val parts = Layout.zOrdered(pts.toDF("x", "y"), "x", "y", partitions = 4)
      .select("__zorder").as[Long]
      .mapPartitions(it => if (it.isEmpty) Iterator.empty else {
        val s = it.toSeq; Iterator((s.min, s.max, s == s.sorted))
      }).collect()
    assert(parts.forall(_._3), "rows must be z-sorted within each partition")
    val ranges = parts.map(p => (p._1, p._2)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"partition z-ranges overlap: $ranges")
      case _ =>
    }
  }
}
