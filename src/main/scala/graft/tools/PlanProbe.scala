package graft.tools
import graft.Engine
/** Dev-only: dump a registered query's plans for inspection. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]", shufflePartitions = 4)
    val df = graft.SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    if (args.lift(2).contains("opt")) println(df.queryExecution.optimizedPlan.toString)
    else { df.collect(); println(df.queryExecution.executedPlan.toString) }
    spark.stop()
  }
}
