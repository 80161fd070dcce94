package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-replay source (FIXTURES.md §B7): split a batch table into N
  * chronological parquet chunks in a watched directory, then open it as a
  * file stream with the same schema — the test stand-in for the reference's
  * periodic collection loop (SURVEY S1), giving deterministic multi-batch
  * streaming runs without a broker.
  */
object Replay {

  /** Write `df` ordered by `tsCol` into `n` chunk files under `dir`. */
  def writeChunks(df: DataFrame, tsCol: String, dir: String, n: Int): Unit = {
    // clear the target: mode(overwrite) only rewrites chunk_0..n-1, so a
    // stale chunk from an earlier, larger replay would stream in as a
    // foreign extra micro-batch (readStream globs chunk_*)
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .filter(_ != root).forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
    val total = df.count()
    val chunk = math.max(1L, (total + n - 1) / n)
    // global row_number is single-partition — fine for test-sized replays.
    // xxhash64 over the full row tiebreaks equal timestamps: without it,
    // chunk membership of ts-tied rows varies run to run, breaking the
    // deterministic-micro-batch contract
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(tsCol), xxhash64(struct(df.columns.map(col): _*)))
    val ranked = df.withColumn("__rn", row_number().over(w).cast("long") - 1)
    // Deterministic chronological chunks; each chunk is one extra file the
    // running stream picks up as its own micro-batch (maxFilesPerTrigger=1).
    ranked.cache()
    try {
      (0 until n).foreach { i =>
        ranked.filter(col("__rn") >= i * chunk && col("__rn") < (i + 1) * chunk)
          .drop("__rn")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/chunk_$i")
      }
    } finally ranked.unpersist()
  }

  /** Open the chunk directory as a file stream, one chunk per micro-batch.
    * Event time is normalized at this ingest boundary (NTZ → TIMESTAMP), so
    * downstream watermarks can never meet a TIMESTAMP_NTZ column. */
  def readStream(spark: SparkSession, schemaOf: DataFrame, dir: String): DataFrame =
    graft.Engine.normalizeEventTime(
      spark.readStream
        .schema(schemaOf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/chunk_*"))
}
