package graft

/** Dev smoke main mirroring the driver's t1 check: SparkEntry.entry must
  * return rows > 0 on sf0.001 using a driver-built session. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[entry-smoke] rows=$n ${if (n > 0) "OK" else "EMPTY — driver smoke would FAIL"}")
    spark.stop()
  }
}
