package graft.tools
import graft.Engine

/** Optimized-plan STRING SIZE per registered query — the cheap detector
  * for the expression re-inlining failure mode found in round 12: a
  * Column `val` referenced N times re-inlines its whole subtree N times
  * (qe5p's corpus hit 175 KB of plan and ran 4-6x slow before its shared
  * subtrees were staged as named columns). Anything over ~100 KB here
  * deserves that treatment; the certificate probe expressions (qe60/qe3e,
  * 40-60 KB of genuinely distinct PQ lookups) are the known benign top.
  * `runMain graft.tools.PlanSizeProbe` */
object PlanSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    val sf = "/root/testdata/sf0.001"
    val sizes = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      try {
        val s = fn(spark, sf).queryExecution.optimizedPlan.toString.length
        Some(n -> s)
      } catch { case t: Throwable =>
        // a plan whose CONSTRUCTION fails (e.g. StackOverflow from the
        // very blow-up this probe detects) must be the loudest line, not
        // a silently dropped one
        println(s"[plansize] $n FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
        None
      }
    }
    sizes.sortBy(-_._2).take(15).foreach { case (n, s) =>
      println(f"[plansize] $n%-36s ${s/1024}%6d KB")
    }
    spark.stop()
  }
}
