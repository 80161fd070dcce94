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
    val total = df.count()
    val chunk = math.max(1L, (total + n - 1) / n)
    // global row_number is single-partition — fine for test-sized replays
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tsCol))
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

  /** Open the chunk directory as a file stream, one chunk per micro-batch. */
  def readStream(spark: SparkSession, schemaOf: DataFrame, dir: String): DataFrame =
    spark.readStream
      .schema(schemaOf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunk_*")
}
