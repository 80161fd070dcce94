package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Session factory + table catalog over a TESTDATA.md scale-factor directory.
  *
  * The engine generalizes the reference's single-record streaming model
  * (`/root/reference/src/event_loops.c:33-52`) to real tables and streams;
  * all batch inputs are the driver-generated parquet tables (TESTDATA.md).
  */
object Engine {

  /** Tuned for local[N] testing; the same settings are what we'd set
    * cluster-side: AQE on (runtime skew/coalesce re-planning), UTC session
    * timezone (reference emits UTC ISO-8601 everywhere, e.g.
    * `src/modules/dd/producer.c:129-134`), shuffle partitions sized to the
    * machine rather than the 200 default.
    */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-nanos parquet columns (events.ts) read as Long; set at
      // session construction so read behavior never depends on whether
      // Tables.events ran first (events keeps a defensive set for
      // driver-built sessions that bypass this factory)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Readers for the driver-generated tables (FIXTURES.md §A). Schemas come
    * from the parquet footers — no runtime inference cost, and filters and
    * projections push down to the scan.
    */
  final case class Tables(spark: SparkSession, dir: String) {
    private def rd(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

    /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark does
      * not read natively. We read it as a long (legacy conf) and floor-divide
      * to microseconds — the driver data is µs-aligned so this is lossless,
      * and matches the DuckDB oracle's `CAST(ts AS TIMESTAMP)` truncation. */
    private def nanosTsToMicros(df: DataFrame, c: String): DataFrame =
      if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else df
    def region: DataFrame     = rd("region")
    def nation: DataFrame     = rd("nation")
    def customer: DataFrame   = rd("customer")
    def supplier: DataFrame   = rd("supplier")
    def part: DataFrame       = rd("part")
    def orders: DataFrame     = rd("orders")
    def lineitem: DataFrame   = rd("lineitem")
    def events: DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      nanosTsToMicros(rd("events"), "ts")
    }
    def documents: DataFrame  = rd("documents")
    def embeddings: DataFrame = rd("embeddings")
  }

  /** Row count from parquet FOOTER metadata — the stand-in for catalog
    * table statistics (what a real deployment would read from the
    * metastore or transaction log): O(files) driver-side footer reads, no
    * Spark job, no corpus scan. Feeds blocking-knob derivation (SRP nbits,
    * k-means training-sample rates) so auto-sizing never costs an extra
    * full pass over the data. */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    def files(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isFile) Seq(st)
      else fs.listStatus(st.getPath).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") || s.getPath.getName.startsWith("."))
        .flatMap(files)
    files(fs.getFileStatus(root))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
  }
}
