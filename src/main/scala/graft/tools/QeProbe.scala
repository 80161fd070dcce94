package graft.tools
import graft.Engine
object QeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]")
    val sf = args(0)
    val names = args.drop(1)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime(); fn(spark, sf).write.format("noop").mode("overwrite").save()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); fn(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"[qeprobe] $n%-30s cold $cold%.2f s warm ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
