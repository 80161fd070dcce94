package graft.tools

import graft.sources.{MqttLike, Sinks}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev smoke: drive the graft-mqtt DataSourceV2 end-to-end through the
  * public readStream/writeStream surface — publish, consume, republish. */
object ConnectorSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[4]", 4)
    val spool = java.nio.file.Files.createTempDirectory("mqtt_smoke").toString
    if (args.nonEmpty && args(0) == "backlog") {
      // multi-partition path: a backlog larger than one planner split
      val n = 2500
      (0 until n).foreach(i => MqttLike.publish(spool, "sensors/bulk", s"""{"i": $i}"""))
      val in = spark.readStream.format("graft-mqtt")
        .option("spoolDir", spool).option("topic", "sensors/bulk").load()
      val q = in.writeStream.format("memory").queryName("bulk")
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
      val seqs = spark.table("bulk").select("msg_seq").collect().map(_.getLong(0)).sorted
      println(s"[connector-smoke] backlog=${seqs.length} contiguous=${seqs.toSeq == (0L until n.toLong)} " +
        (if (seqs.length == n && seqs.toSeq == (0L until n.toLong)) "OK" else "FAIL"))
      spark.stop(); return
    }
    if (args.nonEmpty && args(0) == "module") {
      // drive a registered module (reference module ABI equivalent) e2e
      (0 until 2).foreach(i => MqttLike.publish(spool, "sensors/dd",
        s"""{"timestamp_utc": "2024-12-23T08:00:0${i}Z", "temp_outdoor_celsius": ${20 + i}.5, "temp_indoor_celsius": 22.8, "rh_outdoor": 61.0}"""))
      val q = graft.streaming.ModuleRegistry.start(spark, "dd", spool)
      try q.processAllAvailable() finally q.stop()
      val n = MqttLike.listSeqs(java.nio.file.Paths.get(spool, "sensors_dd_enriched")).size
      println(s"[connector-smoke] module=dd republished=$n " + (if (n == 2) "OK" else "FAIL"))
      spark.stop(); return
    }
    (0 until 3).foreach(i => MqttLike.publish(spool, "sensors/ch",
      s"""{"timestamp": "2024-12-23T08:00:0${i}Z", "temp_celsius": ${20 + i}.1}"""))

    val in = spark.readStream.format("graft-mqtt")
      .option("spoolDir", spool).option("topic", "sensors/ch").load()
    val q = in.select(to_json(struct(col("topic"), col("msg_seq"))).as("payload"))
      .writeStream.foreach(new Sinks.MqttLikePublishWriter(spool, "sensors/out", 1))
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    MqttLike.publish(spool, "sensors/ch", """{"timestamp": "2024-12-23T08:00:09Z", "temp_celsius": 25.0}""")
    q.processAllAvailable()
    q.stop()
    val outSeqs = MqttLike.listSeqs(java.nio.file.Paths.get(spool, "sensors_out"))
    println(s"[connector-smoke] published=4 consumed->republished=${outSeqs.size} " +
      (if (outSeqs.size == 4) "OK" else "MISMATCH"))
    spark.stop()
  }
}
