package graft.tools

import graft.sources.MqttLike
import graft.streaming.{Pipelines, StatefulOps, WatchdogTws}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev smoke: the reference's full consumer path (SURVEY §3.2) end-to-end —
  * graft-mqtt source → dd JSON parse → transformWithState staleness
  * watchdog → memory dashboard; asserts the sentinel 888.8 appears once
  * messages stop arriving. */
object ConsumerSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[4]", 4)
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spool = java.nio.file.Files.createTempDirectory("consumer_smoke").toString
    def publish(i: Int): Unit = { MqttLike.publish(spool, "sensors/dd",
      s"""{"timestamp_utc": "2024-12-23T08:00:0${i}Z", "temp_outdoor_celsius": ${20 + i}.5, "temp_indoor_celsius": 22.8, "rh_outdoor": 61.0}"""); () }
    (0 until 3).foreach(publish)

    val readings = Pipelines.ddConsumer(
      spark.readStream.format("graft-mqtt")
        .option("spoolDir", spool).option("topic", "sensors/dd").load())
      .filter(col("parsed"))
      .select(lit("outdoor").as("key"), col("ts"), col("temp_outdoor_celsius").as("value"))
      .as[StatefulOps.Reading]

    val q = WatchdogTws.stalenessWatchdogTws(readings, toleranceMs = 800)
      .writeStream.format("memory").queryName("consumer_dash")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    val deadline = System.currentTimeMillis() + 20000
    var rows = Seq.empty[StatefulOps.WatchOut]
    while (System.currentTimeMillis() < deadline &&
      !rows.exists(r => r.stale && r.value == 888.8)) {
      Thread.sleep(200)
      rows = spark.table("consumer_dash").as[StatefulOps.WatchOut].collect().toSeq
    }
    q.stop()
    val fresh = rows.count(!_.stale)
    val stale = rows.count(r => r.stale && r.value == 888.8)
    println(s"[consumer-smoke] fresh=$fresh sentinel=$stale " +
      (if (fresh > 0 && stale > 0) "OK" else "FAIL"))
    spark.stop()
  }
}
