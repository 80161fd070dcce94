package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** Streaming MinHash near-dup detection (SURVEY §2.4 E2, streaming form):
  * the LLM-dedup story end-to-end in a stream — documents arrive, their
  * signatures are computed statelessly per row
  * ([[Dedup.minhashSignatureRowwise]], no shuffle, no aggregation state),
  * and LSH band buckets live in keyed state: each (band, bucket) key keeps
  * the doc ids seen so far, and a new member emits a candidate pair against
  * every existing member exactly once.
  *
  * Equivalence with the batch form: replaying a corpus through this
  * operator yields exactly [[Dedup.minhashCandidates]]'s candidate SET
  * (asserted in StreamingSpec). Pairs sharing several band buckets are
  * emitted once per bucket (the batch form's global `distinct` has no
  * streaming analog without a second stateful stage); downstream exact
  * verification (jaccardVerify) is idempotent, so the at-least-once pair
  * multiplicity is harmless — dedupe with `dropDuplicates` + watermark if
  * a sink needs exactly-once pairs.
  *
  * At 100 TB: state is partitioned by (band, bucket) — the same key space
  * the batch equi-join shuffles on — and per-key membership lists stay
  * small exactly when the banding is sized right (see
  * [[Dedup.minhashCandidates]] sizing notes), on the RocksDB state store.
  */
object StreamingDedup {

  case class BandDoc(band: Int, bucket: Int, doc_id: Long)
  case class CandPair(da: Long, db: Long)

  /** Per-(band, bucket) membership state; emits each (existing, new) pair
    * when a doc first joins a bucket. Reprocessed rows (micro-batch retry)
    * are no-ops: a doc already in the member list emits nothing. */
  class BucketProcessor extends StatefulProcessor[(Int, Int), BandDoc, CandPair] {

    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Int, Int), rows: Iterator[BandDoc],
                                 timerValues: TimerValues): Iterator[CandPair] = {
      // materialize only the MEMBERSHIP (O(members)), never the pair set:
      // a hot bucket receiving many docs at once would otherwise buffer
      // O(members x newDocs) CandPair objects before emitting anything —
      // the pairs are generated lazily from prefix views instead
      val initial = members.get().toVector
      val seen = initial.to(collection.mutable.LinkedHashSet)
      val fresh = collection.mutable.ArrayBuffer.empty[Long]
      rows.foreach { r =>
        if (!seen.contains(r.doc_id)) {
          seen += r.doc_id
          fresh += r.doc_id
          members.appendValue(r.doc_id)
        }
      }
      fresh.iterator.zipWithIndex.flatMap { case (d, i) =>
        (initial.iterator ++ fresh.iterator.take(i)).map(e =>
          CandPair(math.min(e, d), math.max(e, d)))
      }
    }
  }

  /** docs(doc_id, text) stream → candidate near-dup pairs (da < db). */
  def minhashCandidatesStream(docs: DataFrame, n: Int = 3, k: Int = 16,
                              bands: Int = 4): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    val banded = Dedup.bandBuckets(Dedup.minhashSignatureRowwise(docs, n, k), k, bands)
      .select(col("band").cast("int").as("band"), col("bucket").as("bucket"),
        col("doc_id")).as[BandDoc]
    banded.groupByKey(b => (b.band, b.bucket))
      .transformWithState(new BucketProcessor, TimeMode.None(), OutputMode.Append(),
        Encoders.product[CandPair])
  }
}
