package graft.tools
import graft.Engine
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._

/** Measure in-sample blocked-pair recall (the qe66 floor) at each SF —
  * floors are pinned from measurements minus margin, never guessed.
  * `runMain graft.tools.CertProbe` */
object CertProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val emb = Engine.Tables(spark, d).embeddings
      val nH = Engine.parquetRowCount(spark, s"$d/embeddings.parquet")
      def inSample(c: org.apache.spark.sql.Column) = Sampling.modSample(c, 4)
      val thr = graft.queries.Extensions.EmbThr
      val samp = emb.filter(inSample(col("vec_id")))
      val exact = Dedup.embeddingNearDups(samp, "vec_id", "embedding", thr)
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val blocked = Dedup.embeddingNearDupsBlocked(emb, "vec_id", "embedding", thr, nHint = nH)
        .filter(inSample(col("da")) && inSample(col("db")))
        .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = exact.count(blocked)
      println(f"[certprobe] $sf%-8s n_exact=${exact.size}%4d hit=$hit%4d recall=${if (exact.isEmpty) 1.0 else hit.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
