package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the streaming form of the Q14c range join and the
  * qe6 attribution as-of. Both sides carry watermarks so the join state is
  * bounded: a row is dropped from state once the other side's watermark
  * passes the end of its match window (Spark's watermark-bounded
  * stream-stream join).
  */
object StreamJoins {

  /** Attribution interval join: each left event matches right events of the
    * same key within `windowSec` BEFORE it (left.ts - window <= right.ts <=
    * left.ts). State is bounded by the watermarks; at 100 TB this is a
    * keyed shuffle join whose state store holds only `windowSec` of data
    * per side. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, windowSec: Long,
                   watermark: String): DataFrame = {
    // normalize first: withWatermark rejects TIMESTAMP_NTZ event time
    val l = graft.Engine.normalizeEventTime(left).withWatermark(leftTs, watermark).as("l")
    val r = graft.Engine.normalizeEventTime(right).withWatermark(rightTs, watermark).as("r")
    // Output columns: all of left, then right WITHOUT the join key (it
    // appears on both sides with identical values — returning both would
    // make a bare col(key) AMBIGUOUS_REFERENCE for every caller). The same
    // hazard holds for the timestamps: the engine-wide event-time
    // convention is ONE column name ("ts"), so leftTs == rightTs is the
    // common case — the right side's is then returned as `<rightTs>_r`.
    val rCols = right.columns.toIndexedSeq.filterNot(_ == key).map { c =>
      if (c == rightTs && leftTs == rightTs) col(s"r.$c").as(s"${c}_r")
      else col(s"r.$c")
    }
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $windowSec SECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs"))
      .select(col("l.*") +: rCols: _*)
  }
}
