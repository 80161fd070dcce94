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

  /** Delete a directory tree's CONTENTS (the root stays) — shared with
    * [[graft.Verify]]'s output-dir clear so the walk/reverse/delete idiom
    * has one owner. */
  private[graft] def clearTree(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.isDirectory(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .filter(_ != root).forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }

  /** Write `df` ordered by `tsCol` into (up to) `n` chunk files under
    * `dir` — BALANCED buckets (sizes differ by at most one, never an
    * empty trailing chunk: ceil-division sizing could emit zero-row
    * parquet files that stream in as empty micro-batches, firing
    * processing-time timeouts on a trigger that carries no data). Chunk
    * names are zero-padded: the file stream breaks mtime ties in LISTING
    * order, and unpadded chunk_10 sorts before chunk_2 — out-of-order
    * micro-batches on any coarse-mtime filesystem. */
  def writeChunks(df: DataFrame, tsCol: String, dir: String, n: Int): Unit = {
    // clear the target: mode(overwrite) only rewrites chunk_0..n-1, so a
    // stale chunk from an earlier, larger replay would stream in as a
    // foreign extra micro-batch (readStream globs chunk_*)
    clearTree(java.nio.file.Paths.get(dir))
    // global row_number is single-partition — fine for test-sized replays.
    // xxhash64 over the full row tiebreaks equal timestamps: without it,
    // chunk membership of ts-tied rows varies run to run, breaking the
    // deterministic-micro-batch contract
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(tsCol), xxhash64(struct(df.columns.map(col): _*)))
    val ranked = df.withColumn("__rn", row_number().over(w).cast("long") - 1)
    // Deterministic chronological chunks; each chunk is one extra file the
    // running stream picks up as its own micro-batch (maxFilesPerTrigger=1).
    // cache BEFORE count so the count itself fills the cache — count-then-
    // cache scanned the source twice
    ranked.cache()
    try {
      val total = ranked.count()
      // empty replay writes NOTHING (clearTree already ran): the old
      // max(1, total) floor emitted one zero-row chunk — exactly the
      // empty-micro-batch hazard chunking exists to avoid
      val buckets = math.min(n.toLong, total).toInt
      (0 until buckets).foreach { i =>
        // balanced assignment: row r lands in bucket r*buckets/total
        ranked.filter(floor(col("__rn") * buckets / math.max(total, 1L)) === i)
          .drop("__rn")
          .coalesce(1).write.mode("overwrite").parquet(f"$dir/chunk_$i%05d")
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
