package graft

import org.apache.spark.sql.functions._

/** §2.2 file-format coverage: csv/json/parquet write→read round trips
  * preserve a parity query's rows exactly (engine claims built-ins). */
class FormatsSpec extends SparkTestBase {

  private lazy val base = SparkEntry.queries("q11_agg")(spark, Sf0001)

  private def roundTrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"fmt_$fmt").toString
    base.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
    val back = spark.read.format(fmt).schema(base.schema)
      .option("header", "true").load(dir)
      .select(base.columns.map(col): _*)
    val want = base.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val got = back.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(got.length == want.length, s"$fmt row count")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$fmt: $g != $w") }
  }

  test("parquet round trip")(roundTrip("parquet"))
  test("json round trip")(roundTrip("json"))
  test("csv round trip")(roundTrip("csv"))

  test("csv/json read handles malformed rows permissively") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_bad").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "x.json"),
      """{"a": 1, "b": "ok"}
        |not json at all
        |{"a": 2, "b": "fine"}""".stripMargin)
    val df = spark.read.schema("a INT, b STRING, _corrupt_record STRING")
      .json(dir).cache() // corrupt-record-only queries require materialization
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    df.unpersist()
  }
}
