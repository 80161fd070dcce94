package graft

import org.apache.spark.sql.functions._

class EngineSpec extends SparkTestBase {

  test("all ten catalog tables read with expected keys present") {
    val t = Engine.Tables(spark, Sf0001)
    val checks = Seq(
      t.region -> "r_regionkey", t.nation -> "n_nationkey",
      t.customer -> "c_custkey", t.supplier -> "s_suppkey",
      t.part -> "p_partkey", t.orders -> "o_orderkey",
      t.lineitem -> "l_orderkey", t.events -> "event_id",
      t.documents -> "doc_id", t.embeddings -> "vec_id")
    checks.foreach { case (df, key) =>
      assert(df.columns.contains(key) && df.count() > 0, s"table missing $key")
    }
    // events.ts surfaces as a real timestamp despite the TIMESTAMP(NANOS) file
    assert(Engine.Tables(spark, Sf0001).events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("normalizeTs accepts all three driver timestamp shapes and agrees on the instant") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // the driver has shipped events.ts as TIMESTAMP(NANOS) (reads as Long
    // under the legacy conf), as timestamp[us] without tz (reads as
    // TIMESTAMP_NTZ), and could ship plain TIMESTAMP — write a fixture per
    // shape so the next format change fails THIS test, not six queries
    val dir = java.nio.file.Files.createTempDirectory("tsshapes").toString
    val usEpoch = Seq(1700000000000000L, 1700000123456789L)

    // shape 1: int64 column (what a NANOS column surfaces as under
    // spark.sql.legacy.parquet.nanosAsLong), carrying nanosecond values
    usEpoch.map(_ * 1000L).toDF("ts").write.mode("overwrite").parquet(s"$dir/nanos")
    // shape 2: TIMESTAMP_NTZ (parquet timestamp[us], isAdjustedToUTC=false)
    usEpoch.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    // shape 3: TIMESTAMP (µs, tz-adjusted)
    usEpoch.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/tz")

    val shapes = Seq("nanos" -> LongType, "ntz" -> TimestampNTZType, "tz" -> TimestampType)
    val normalized = shapes.map { case (name, raw) =>
      val df = spark.read.parquet(s"$dir/$name")
      assert(df.schema("ts").dataType == raw, s"fixture $name lost its raw shape")
      val out = Engine.normalizeTs(df, "ts")
      assert(out.schema("ts").dataType == TimestampType, s"shape $name not normalized")
      name -> out.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    }.toMap
    // all three shapes decode to the SAME instants (UTC session => lossless)
    assert(normalized.values.toSet.size == 1 && normalized("tz") == usEpoch)
    // blanket streaming-boundary form: every NTZ column normalized
    val ntz = spark.read.parquet(s"$dir/ntz")
    assert(Engine.normalizeEventTime(ntz).schema("ts").dataType == TimestampType)
  }

  test("typed Dataset boundary accepts NTZ input once normalized (T9/X2 encoder path)") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampNTZType
    // the failure r8 shipped: an NTZ ts reaching as[UpsReading] blows up in
    // the java.sql.Timestamp encoder. normalizeEventTime at the boundary
    // must make the typed path (and its stateful ops) work unchanged.
    val ntz = Seq((1L, 1700000000000000L, 150.0, 80.0), (1L, 1700000060000000L, 140.0, 79.0))
      .toDF("device_id", "us", "current_ma", "batt_pct")
      .select(col("device_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("current_ma"), col("batt_pct"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val typed = Engine.normalizeEventTime(ntz).as[graft.streaming.StatefulOps.UpsReading]
    val out = graft.streaming.StatefulOps.upsDerivedBatch(typed).collect()
    assert(out.length == 2 && out.forall(_.getAs[String]("status") == "Charging"))
  }

  test("mqtt topic sanitization maps slashes and odd chars to filesystem-safe names") {
    assert(graft.sources.MqttLike.sanitize("sensors/dd+x #1") == "sensors_dd_x__1")
    assert(graft.sources.MqttLike.sanitize("plain.topic-name_0") == "plain.topic-name_0")
  }

  test("parquetRowCount (footer statistics) matches the scanned count, file and directory layouts") {
    val p = s"$Sf0001/embeddings.parquet"
    assert(graft.Engine.parquetRowCount(spark, p) == spark.read.parquet(p).count())
    // multi-file directory layout (the cluster shape): counts sum across parts
    val dir = java.nio.file.Files.createTempDirectory("prc").toString
    spark.read.parquet(p).repartition(3).write.mode("overwrite").parquet(dir)
    assert(graft.Engine.parquetRowCount(spark, dir) == spark.read.parquet(p).count())
  }

  test("dashboard upsert keeps newest reading per key regardless of arrival order") {
    import spark.implicits._
    val (view, upsert) = graft.sources.Sinks.dashboardSink("k", "ts", "v")
    def batch(rows: (String, java.sql.Timestamp, Double)*) =
      rows.toSeq.toDF("k", "ts", "v")
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    upsert(batch(("a", ts(10), 1.0)), 0L)
    upsert(batch(("a", ts(5), 2.0)), 1L)  // older arrives later: ignored
    upsert(batch(("a", ts(20), 3.0)), 2L) // newer: wins
    assert(view.get("a") == (ts(20), 3.0))
  }
}
