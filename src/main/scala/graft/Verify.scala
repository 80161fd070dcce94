package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Engine.session is the ONE session recipe (AQE + coalescer floor +
    // UTC + nanosAsLong at construction) — re-implemented blocks here and
    // in Bench had each drifted from it
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=qe31,qe28 narrows to matching prefixes for
    // fast single-query iteration (dev only; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      val out = Paths.get(s"$outDir/$name")
      // stale output from a previous run must never stand in for a query
      // that now throws — delete FIRST so a failure leaves no dir and the
      // driver's compare reports the failure instead of old results
      // (ONE walk/reverse/delete owner: Replay.clearTree empties, then
      // the root itself goes)
      graft.streaming.Replay.clearTree(out)
      Files.deleteIfExists(out)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a partial write must not look like a result either
        graft.streaming.Replay.clearTree(out)
        Files.deleteIfExists(out)
      }
    }
    // JSON string escape: a tab or CR in builder-authored SQL would
    // otherwise make the driver's json.load fail and silently zero the
    // round's correctness. ONE escaper (Bench.jsonEscape) serves both
    // runtime surfaces.
    def q(s: String): String = "\"" + Bench.jsonEscape(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
