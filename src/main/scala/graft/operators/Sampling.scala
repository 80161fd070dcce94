package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * [[BottomKIds]] is the distributed, deterministic "reservoir": every row
  * gets a priority from a seeded splitmix64 of its id; the k smallest
  * priorities win. Priorities are order- and partitioning-independent, so
  * the sample is uniform, mergeable (classic bottom-k sketch) and
  * reproducible — unlike Algorithm-R reservoirs whose result depends on
  * row arrival order. Exposed as a typed `Aggregator` (the engine's
  * UDAF surface, SURVEY §2.2) usable per group via `functions.udaf`.
  */
object Sampling {

  /** splitmix64 finalizer (public-domain mixing constants). */
  private[operators] def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  case class BKItem(priority: Long, id: Long)

  class BottomKIds(k: Int, seed: Long)
      extends Aggregator[Long, Seq[BKItem], Seq[Long]] {
    private def trim(s: Seq[BKItem]): Seq[BKItem] =
      s.sortBy(i => (i.priority, i.id)).take(k)
    override def zero: Seq[BKItem] = Seq.empty
    override def reduce(buf: Seq[BKItem], id: Long): Seq[BKItem] =
      trim(buf :+ BKItem(mix64(id ^ seed), id))
    override def merge(a: Seq[BKItem], b: Seq[BKItem]): Seq[BKItem] = trim(a ++ b)
    override def finish(buf: Seq[BKItem]): Seq[Long] =
      buf.sortBy(i => (i.priority, i.id)).map(_.id)
    override def bufferEncoder: Encoder[Seq[BKItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[BKItem]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group deterministic uniform sample of `k` ids. */
  def sampleIdsPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                        k: Int, seed: Long = 42L): DataFrame = {
    val bk = udaf(new BottomKIds(k, seed))
    df.groupBy(groupCols.map(col): _*)
      .agg(bk(col(idCol)).as("sample_ids"))
  }

  /** Whole-table deterministic p-percent sample (hash-mod filter — pushes
    * down, no shuffle; the codegen'd form of systematic sampling). */
  def deterministicSample(df: DataFrame, idCol: String, percent: Int,
                          seed: Long = 42L): DataFrame =
    df.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(100)) < percent)

  /** Deterministic train/val/test split: hash-range assignment adds a
    * `split` column. Stable across runs/partitionings, disjoint and
    * exhaustive, and stable under corpus growth (a row's split never
    * changes when other rows are added) — the property random splits
    * lack. Weights are percentages summing to 100. */
  def splitByHash(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
                  seed: Long = 42L): DataFrame = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(100))
    val expr = splits.tail.foldLeft((when(bucket < splits.head._2, splits.head._1),
      splits.head._2)) { case ((acc, cum), (name, w)) =>
      (acc.when(bucket < cum + w, name), cum + w)
    }._1
    df.withColumn("split", expr)
  }
}
