package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev smoke: GraftExtensions wired the production way
  * (spark.sql.extensions) — SQL cosine_sim resolves and the HOF-cosine
  * optimizer rewrite fires in a fresh session. */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.Engine.Tables(spark, "/root/testdata/sf0.001").embeddings.limit(10)
      .createOrReplaceTempView("emb")
    val viaSql = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) AS c FROM emb a, emb b WHERE a.vec_id = 0 AND b.vec_id = 1")
      .head().getDouble(0)
    // the whole kernel-function surface resolves from SQL
    val others = spark.sql(
      """SELECT dot_product(embedding, embedding) AS d,
        |       srp_buckets(embedding, 2, 4, 64, 42)[0] AS b,
        |       token_entropy(array('a','a','b')).entropy AS e,
        |       repetition_stats(array('a','a','b')).dup_word_frac AS r
        |FROM emb WHERE vec_id = 0""".stripMargin).head()
    println(s"[extensions-smoke] dot=${others.getDouble(0)} bucket=${others.getLong(1)} " +
      f"entropy=${others.getDouble(2)}%.4f dup=${others.getDouble(3)}%.4f")

    val hof = spark.table("emb").limit(3)
      .select(graft.functions.VectorOps.cosine(col("embedding"), col("embedding")).as("c"))
    val fired = hof.queryExecution.optimizedPlan
      .collect { case n => n.expressions.flatMap(_.collect {
        case e: graft.functions.CosineSim => e }) }.flatten.nonEmpty

    println(s"[extensions-smoke] sql_cosine=$viaSql rule_fired=$fired " +
      (if (fired && viaSql >= -1 && viaSql <= 1) "OK" else "FAIL"))
    if (!fired) println("[extensions-smoke] optimized:\n" +
      hof.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
