package graft.tools

import graft.operators.Multimodal
import graft.streaming.StreamJoins
import org.apache.spark.sql.functions._

/** Dev smoke: drive library operators that aren't on the query surface —
  * multimodal resize stage and the stream-stream interval join — through
  * the public API against real test data. */
object OpsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[4]", 4)
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents.limit(20)
    val resized = Multimodal.resizeAll(Multimodal.attachPayload(docs), 64, 64)
    val nR = resized.count()
    val shrunk = resized.select(octet_length(col("payload")).as("n")).agg(max("n")).head().getInt(0)

    val ev = graft.Engine.Tables(spark, "/root/testdata/sf0.001").events
    val clicks = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts").as("cts"))
    val purch = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("ts").as("pts"))
    // batch form of the interval join predicate sanity-checks the operator's
    // condition; streaming form is driven in StreamJoinsSpec via MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("ssj_smoke").toString
    graft.streaming.Replay.writeChunks(purch, "pts", dir, 2)
    val joined = StreamJoins.intervalJoin(
      graft.streaming.Replay.readStream(spark, purch, dir), clicks
        .withColumn("cts", col("cts")), "user_id", "pts", "cts",
      windowSec = 3600, watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj_smoke")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val nJ = spark.table("ssj_smoke").count()
    val splits = graft.operators.Sampling.splitByHash(ev, "event_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[ops-smoke] resized=$nR max_bytes=$shrunk stream_join_rows=$nJ " +
      s"splits=$splits " +
      (if (nR == 20 && nJ > 0 && splits.size == 3) "OK" else "FAIL"))
    spark.stop()
  }
}
