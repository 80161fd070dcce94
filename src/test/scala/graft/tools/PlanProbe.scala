package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.window.WindowExec

/** Diagnostic for SurfaceAuditSpec allowlist triage: prints, for the named
  * queries (args, or a default set), each BroadcastNestedLoopJoin's two
  * sides and each empty-partition window's child, so allowlist entries are
  * justified from plan evidence rather than guesses.
  * Run: sbt 'Test/runMain graft.tools.PlanProbe <query names...>' */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("plan-probe").getOrCreate()
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "qe3_knn_brute", "qe3c_knn_ivf", "qe17_quality_gate", "qe28_bm25",
      "qe51_zorder_card", "qe53_temperature_mix", "qe7_embed_neardup")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.sparkPlan
      println(s"===== $n =====")
      plan.collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
        val bcast = Seq(b.left, b.right).collectFirst {
          case e: BroadcastExchangeExec => e }
        val scalarAgg = bcast.exists(_.collectFirst {
          case a: HashAggregateExec if a.groupingExpressions.isEmpty => a
          case a: SortAggregateExec if a.groupingExpressions.isEmpty => a
          case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => a
        }.nonEmpty)
        println(s"-- BNLJ joinType=${b.joinType} buildSide=${b.buildSide} scalarAggBcast=$scalarAgg")
        println("---- left:")
        println(b.left.treeString.linesIterator.take(8).mkString("\n"))
        println("---- right:")
        println(b.right.treeString.linesIterator.take(8).mkString("\n"))
      }
      plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.foreach { w =>
        println("-- empty-partition WindowExec child:")
        println(w.child.treeString.linesIterator.take(12).mkString("\n"))
      }
    }
    spark.stop()
  }
}
