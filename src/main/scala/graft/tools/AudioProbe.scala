package graft.tools

import graft.Engine
import org.apache.spark.sql.DataFrame

/** Dev-only: stage-split timing for the audio dedup family —
  * corpus build vs decode+hash vs full dedup (r17 optimization round).
  * `runMain graft.tools.AudioProbe [sfDir]` */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("local[32]", 32)
    val docs = Engine.Tables(spark, sfDir).documents

    def time(name: String)(df: => DataFrame): Unit = {
      val built = df
      built.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      built.write.format("noop").mode("overwrite").save()
      println(f"[audioprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    import graft.operators.AudioDedup
    time("corpus build only")(AudioDedup.syntheticDupAudioCorpus(docs))
    time("build+signatures")(AudioDedup.audioSignatures(
      AudioDedup.syntheticDupAudioCorpus(docs)).toDF())
    time("full dedupBySamples")(AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpus(docs)))
    time("flac corpus only")(AudioDedup.syntheticDupAudioCorpusFlac(docs))
    time("flac+signatures")(AudioDedup.audioSignatures(
      AudioDedup.syntheticDupAudioCorpusFlac(docs)).toDF())
    spark.stop()
  }
}
