package graft.tools

import graft.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: time expression variants and dump explain for a named query.
  * `runMain graft.tools.PerfProbe <sfDir> [queryName]` */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session("local[32]")
    val ev = Engine.Tables(spark, sfDir).events

    def time(name: String)(df: DataFrame): Unit = {
      val c0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val cold = (System.nanoTime() - c0) / 1e9
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-28s cold $cold%.3f s  warm ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    if (args.length > 1 && args(1) == "shingle_variants") {
      val docs = Engine.Tables(spark, sfDir).documents
      val ws = col("ws")
      def t(name: String)(df: DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      val toks = docs.select(col("doc_id"), graft.operators.TextAnalysis.tokens(col("text")).as("ws"))
      t("tokens only")(toks)
      t("split only")(docs.select(col("doc_id"), split(col("text"), "\\s+").as("ws")))
      val viaGet = transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", get(ws, i), get(ws, i + 1), get(ws, i + 2)))
      val viaSlice = transform(sequence(lit(1), size(ws) - 2),
        i => array_join(slice(ws, i, lit(3)), " "))
      t("arr via get")(toks.select(viaGet.as("sh")))
      t("arr via slice")(toks.select(viaSlice.as("sh")))
      t("arr+distinct via get")(toks.select(array_distinct(viaGet).as("sh")))
      t("explode via get")(toks.select(col("doc_id"), explode(array_distinct(viaGet)).as("s")))
      t("explode via slice")(toks.select(col("doc_id"), explode(array_distinct(viaSlice)).as("s")))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "cosine_scale") {
      import graft.functions.{CosineSim, VectorOps}
      val emb = Engine.Tables(spark, sfDir).embeddings
      val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
        .crossJoin(broadcast(emb.select(col("vec_id").as("b"), col("embedding").as("vb"))))
      def t(name: String)(df: DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      t("4M pairs fused kernel")(pairs.select(
        CosineSim.cosine_sim(col("va"), col("vb")).as("c")))
      t("4M pairs composable HOF")(pairs.select(
        VectorOps.cosine(col("va"), col("vb")).as("c")))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "shingle_explain") {
      val docs = Engine.Tables(spark, sfDir).documents
      println("=== Dedup.shingles ===")
      graft.operators.Dedup.shingles(docs, 3).explain(true)
      val toks = docs.select(col("doc_id"), graft.operators.TextAnalysis.tokens(col("text")).as("ws"))
      val ws = col("ws")
      val viaGet = transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", get(ws, i), get(ws, i + 1), get(ws, i + 2)))
      println("=== inline fast ===")
      toks.select(col("doc_id"), explode(array_distinct(viaGet)).as("s")).explain(true)
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "minhash_stages") {
      val docs = Engine.Tables(spark, sfDir).documents
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[probe] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      t("shingles")(graft.operators.Dedup.shingles(docs, 3)
        .write.format("noop").mode("overwrite").save())
      t("signature")(graft.operators.Dedup.minhashSignature(docs, 3, 16)
        .write.format("noop").mode("overwrite").save())
      val cand = graft.operators.Dedup.minhashCandidates(docs)
      t("candidates")(cand.write.format("noop").mode("overwrite").save())
      println(s"[probe] n_candidates=${cand.count()}")
      t("verify")(graft.operators.Dedup.jaccardVerify(docs, cand, 3, 0.5)
        .write.format("noop").mode("overwrite").save())
      spark.stop(); return
    }
    if (args.length > 1) {
      graft.SparkEntry.queries(args(1))(spark, sfDir).explain("formatted")
      (1 to 6).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(args(1))(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.stop(); return
    }

    time("scan+sort")(ev.select(col("event_id"), col("event_type")).orderBy("event_id"))
    time("to_json only")(ev.select(col("event_id"),
      to_json(struct(col("event_id"), col("event_type"), round(col("value"), 4).as("v"))).as("js")))
    time("get_json_object props")(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").as("x")))
    time("from_json props")(ev.select(col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("x")))
    time("tojson+getjson (q22 core)")(ev.select(col("event_id"),
      get_json_object(to_json(struct(col("event_id"), col("event_type"),
        round(col("value"), 4).as("v"))), "$.event_type").as("extracted")))
    time("q22 full")(graft.SparkEntry.queries("q22_json_roundtrip")(spark, sfDir))
    spark.stop()
  }
}
