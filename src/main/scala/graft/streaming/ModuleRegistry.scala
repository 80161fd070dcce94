package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** The reference's module system re-expressed declaratively (SURVEY §1.1):
  * where the reference compiles exactly one module into the binary behind a
  * 6-function C ABI (`src/modules/module.h:14-53`, selection
  * `src/CMakeLists.txt:5-35`), the engine holds a registry of pipeline
  * definitions — a module is data (source topic + transform + sink), not a
  * build configuration, and any number can run concurrently as independent
  * StreamingQueries.
  */
object ModuleRegistry {

  /** A module: where samples come from, how each micro-batch is transformed,
    * where results go (collection/post_collection, declaratively). */
  final case class Module(
      name: String,
      sourceTopic: String,
      transform: DataFrame => DataFrame,
      sinkTopic: String,
      payload: DataFrame => Column,
      triggerMs: Long = 1000L) // reference default cadence, global_vars.c:10

  /** The reference's concrete modules (dd, ch, hko) over the graft-mqtt
    * transport; `sample` is the no-op skeleton (`sample.c`). */
  val modules: Map[String, Module] = Seq(
    Module("dd", "sensors/dd",
      df => Pipelines.ddConsumer(df).filter(col("parsed")),
      "sensors/dd_enriched",
      df => to_json(struct(df("ts"), df("temp_outdoor_celsius"),
        df("temp_indoor_celsius"), df("rh_outdoor")))),
    Module("ch", "sensors/ch_raw",
      df => Pipelines.ch(df
        .withColumn("j", from_json(col("payload"), Pipelines.ChSchema))
        .withColumn("ts", graft.functions.ScalarOps.isoParse(col("j.timestamp")))
        .withColumn("raw_tenths", (col("j.temp_celsius") * 10).cast("int"))),
      "sensors/ch",
      df => to_json(struct(df("timestamp"), df("temp_celsius")))),
    Module("hko", "sensors/hko_raw",
      df => Pipelines.hko(df.withColumnRenamed("payload", "doc"), "Happy Valley",
        current_timestamp()),
      "sensors/hko",
      df => to_json(struct(df("fh_timestamp"), df("hko_timestamp"), df("temp_celsius")))),
    Module("sample", "sensors/sample", identity, "sensors/sample_out", df => df("payload"))
  ).map(m => m.name -> m).toMap

  /** Start a registered module as a streaming query over the spool
    * transport — the engine's `ev_collect_data` loop equivalent. */
  def start(spark: SparkSession, name: String, spoolDir: String,
            checkpoint: Option[String] = None) = {
    val m = modules.getOrElse(name,
      throw new IllegalArgumentException(s"unknown module '$name'; have ${modules.keys.mkString(",")}"))
    val in = spark.readStream.format("graft-mqtt")
      .option("spoolDir", spoolDir).option("topic", m.sourceTopic).load()
    val transformed = m.transform(in)
    // one writer task per topic: publish allocates dense seqs, and a single
    // broker session is the reference's delivery model anyway (mqtt.c)
    val out = transformed.select(m.payload(transformed).as("payload")).coalesce(1)
    val w: DataStreamWriter[Row] = out.writeStream
      .foreach(new graft.sources.Sinks.MqttLikePublishWriter(spoolDir, m.sinkTopic, 1))
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(s"${m.triggerMs} milliseconds"))
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
