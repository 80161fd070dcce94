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
    val (view, upsert) = graft.sources.Sinks.dashboardSink(
      spark.emptyDataFrame, "k", "ts", "v")
    def batch(rows: (String, java.sql.Timestamp, Double)*) =
      rows.toSeq.toDF("k", "ts", "v")
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    upsert(batch(("a", ts(10), 1.0)), 0L)
    upsert(batch(("a", ts(5), 2.0)), 1L)  // older arrives later: ignored
    upsert(batch(("a", ts(20), 3.0)), 2L) // newer: wins
    assert(view.get("a") == (ts(20), 3.0))
  }
}
