package graft.streaming

import graft.streaming.StatefulOps.{Reading, WatchOut}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** X3 staleness watchdog on the `transformWithState` API (Spark 4's
  * successor to flatMapGroupsWithState — SURVEY §7 step 6 names it the
  * preferred form). Same semantics as [[StatefulOps.stalenessWatchdog]]:
  * per-key latest value; a timer fires after `toleranceMs` without updates
  * and emits the reference's sentinel 888.8 row
  * (ref `src/modules/dd/consumer.cpp:241-268`).
  *
  * Differences from the FMGWS form worth having on record: typed per-key
  * `ValueState` with explicit TTL-free lifecycle, first-class timers
  * (`registerTimer`/`handleExpiredTimer`) instead of a single timeout slot,
  * and state-store-backed variables that survive query restarts.
  *
  * Requires the RocksDB state store provider (column families):
  * `spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
  * — also the provider you'd run at 100 TB (bounded heap, incremental
  * checkpoints); the default HDFS-backed provider throws
  * STATE_STORE_MULTIPLE_COLUMN_FAMILIES.
  */
class WatchdogProcessor(toleranceMs: Long, sentinel: Double)
    extends StatefulProcessor[String, Reading, WatchOut] {

  // only the armed-timer handle lives in state: unlike FMGWS (where a state
  // value must exist for a timeout to exist), TWS timers stand alone, and a
  // per-row "latest value" ValueState would be a RocksDB write nothing
  // reads — the fresh emission already carries the value
  @transient private var timerSet: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    timerSet = getHandle.getValueState[Long]("timer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[Reading],
                               timerValues: TimerValues): Iterator[WatchOut] = {
    // (ts, value) tiebreak: bare maxBy on ts picks ts-tied rows in
    // shuffle-iterator order — nondeterministic across runs
    val latest = rows.maxBy(r => (r.ts.getTime, r.value))
    // slide the staleness timer: drop the old one, arm a fresh tolerance
    if (timerSet.exists()) getHandle.deleteTimer(timerSet.get())
    val fireAt = timerValues.getCurrentProcessingTimeInMs() + toleranceMs
    getHandle.registerTimer(fireAt)
    timerSet.update(fireAt)
    Iterator.single(WatchOut(key, latest.value, stale = false))
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[WatchOut] = {
    timerSet.clear()
    Iterator.single(WatchOut(key, sentinel, stale = true))
  }
}

object WatchdogTws {
  def stalenessWatchdogTws(readings: Dataset[Reading], toleranceMs: Long,
                           sentinel: Double = 888.8): Dataset[WatchOut] = {
    import readings.sparkSession.implicits._
    readings.groupByKey(_.key)
      .transformWithState(new WatchdogProcessor(toleranceMs, sentinel),
        TimeMode.ProcessingTime(), OutputMode.Append(), Encoders.product[WatchOut])
  }
}
