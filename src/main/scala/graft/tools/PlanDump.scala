package graft.tools

import graft.Engine

/** Dev tool: write `.explain("formatted")` for registered queries to files —
  * the before/after plan evidence for optimization rounds.
  * `runMain graft.tools.PlanDump <outDir> <suffix> <query1,query2,...> [sfDir]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // dev-tool arg guard (ADVICE r17): a missing arg or unknown query
    // name gets a one-line usage error, not a raw IndexOutOfBounds
    if (args.length < 3) {
      System.err.println(
        "usage: PlanDump <outDir> <suffix> <query1,query2,...> [sfDir]")
      sys.exit(2)
    }
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")} " +
        "(names are SparkEntry.queries keys, e.g. qe13_dup_clusters)")
      sys.exit(2)
    }
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("local[32]", 32)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
