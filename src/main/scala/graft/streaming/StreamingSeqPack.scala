package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** Streaming sequence packing (batch twin: [[graft.operators.SeqPack
  * .packSharded]]): documents arrive append-only and each gets its training
  * bin the moment it lands — no batch repack over the whole corpus when new
  * data arrives, which is exactly what an always-on ingestion pipeline
  * needs.
  *
  * State is ONE counter per shard (the cumulative token total packed so
  * far), keyed the same way the batch window partitions — so state size is
  * |shards|, independent of corpus length, and bins never span shards.
  * Within a micro-batch a shard's rows are folded in doc_id order;
  * replaying a corpus in id-ordered arrival therefore reproduces the batch
  * form bit-for-bit (asserted in StreamingSpec). Out-of-order arrival packs
  * in arrival order instead — the legitimate streaming semantics for an
  * append-only corpus where "order" IS arrival.
  */
object StreamingSeqPack {

  case class DocTok(shard: Long, doc_id: Long, n_tok: Long)
  case class PackedDoc(shard: Long, doc_id: Long, n_tok: Long, bin: Long)

  /** Per-shard cumulative-token state; assigns `bin = cum div budget` at
    * the document's first token, like the batch window form. */
  class PackProcessor(budget: Long) extends StatefulProcessor[Long, DocTok, PackedDoc] {

    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[DocTok],
                                 timerValues: TimerValues): Iterator[PackedDoc] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { r =>
        val bin = c / budget
        c += r.n_tok
        PackedDoc(r.shard, r.doc_id, r.n_tok, bin)
      }
      cum.update(c)
      out.iterator
    }
  }

  case class SplitSlice(shard: Long, doc_id: Long, seg_idx: Long, bin: Long, n_tok: Long)

  /** Splitting form of [[PackProcessor]] (batch twin:
    * [[graft.operators.SeqPack.packSplitSharded]]): the same one-counter-
    * per-shard state, but a document straddling a budget boundary emits
    * one slice row per bin it crosses — the concat-then-chunk semantics a
    * training run feeds. Slice arithmetic is identical to the batch
    * window form, so id-ordered replay reproduces it bit-for-bit
    * (asserted in StreamingSpec). */
  class PackSplitProcessor(budget: Long)
      extends StatefulProcessor[Long, DocTok, SplitSlice] {

    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[DocTok],
                                 timerValues: TimerValues): Iterator[SplitSlice] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).flatMap { r =>
        val o = c
        c += r.n_tok
        if (r.n_tok <= 0) Seq.empty
        else {
          val b0 = o / budget
          val b1 = (o + r.n_tok - 1) / budget
          (b0 to b1).map { bin =>
            SplitSlice(r.shard, r.doc_id, bin - b0, bin,
              math.min(o + r.n_tok, (bin + 1) * budget) - math.max(o, bin * budget))
          }
        }
      }
      cum.update(c)
      out.iterator
    }
  }

  /** docs(shard, doc_id, n_tok) stream → (doc, bin) slice rows with exact
    * budget-boundary splitting; state and ordering caveats as
    * [[packStream]]. */
  def packSplitStream(docs: DataFrame, budget: Long): Dataset[SplitSlice] = {
    require(budget > 0, s"packSplitStream: token budget must be positive, got $budget")
    import docs.sparkSession.implicits._
    docs.select(col("shard").cast("long"), col("doc_id").cast("long"),
        col("n_tok").cast("long")).as[DocTok]
      .groupByKey(_.shard)
      .transformWithState(new PackSplitProcessor(budget), TimeMode.None(), OutputMode.Append(),
        Encoders.product[SplitSlice])
  }

  /** docs(shard, doc_id, n_tok) stream → per-doc bin assignments.
    *
    * A shard's micro-batch rows are buffered and sorted in executor heap
    * (`handleInputRows` below) — unlike the batch twin's spilling window
    * sort. Backfill replays must therefore arrive in bounded micro-batches
    * (source-side admission: maxFilesPerTrigger / maxOffsetsPerTrigger). */
  def packStream(docs: DataFrame, budget: Long): Dataset[PackedDoc] = {
    require(budget > 0, s"packStream: token budget must be positive, got $budget")
    import docs.sparkSession.implicits._
    docs.select(col("shard").cast("long"), col("doc_id").cast("long"),
        col("n_tok").cast("long")).as[DocTok]
      .groupByKey(_.shard)
      .transformWithState(new PackProcessor(budget), TimeMode.None(), OutputMode.Append(),
        Encoders.product[PackedDoc])
  }
}
