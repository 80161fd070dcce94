package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Spark-side coverage for the compressed-format metadata parsers (qe5i /
  * qe5j): expression + SQL registration agree with the JVM parser, nulls
  * propagate, and the planted corpora parse back to exactly the arithmetic
  * params their oracles state. Bit-level edge cases live in MediaFuzzSpec
  * (pure JVM, golden vectors). */
class CompressedMetaSpec extends SparkTestBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("mpeg_audio_meta + avc_sps_dims: expression and SQL agree; nulls propagate") {
    import spark.implicits._
    MpegAudioMetaExpr.register(spark)
    AvcSpsDimsExpr.register(spark)
    val mp3 = hex("FFFB9000" + "00" * 16)
    val sps = AvcSpsHeader.buildSps(77, 31, 1280, 720)
    val df = Seq((1L, mp3), (2L, sps), (3L, "neither".getBytes))
      .toDF("id", "payload")
    val viaCol = df.select(col("id"),
        MpegAudioMetaExpr.mpeg_audio_meta(col("payload")).as("a"),
        AvcSpsDimsExpr.avc_sps_dims(col("payload")).as("v"))
      .collect().map { r =>
        (r.getLong(0), !r.isNullAt(1), !r.isNullAt(2))
      }.toSet
    // each payload parses under exactly its own family's parser
    assert(viaCol == Set((1L, true, false), (2L, false, true), (3L, false, false)))
    df.createOrReplaceTempView("comp")
    val viaSql = spark.sql(
      """SELECT id, mpeg_audio_meta(payload).bitrate_kbps AS kbps,
        |       avc_sps_dims(payload).width AS w
        |FROM comp ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
    assert(viaSql == Seq((1L, 128, -1), (2L, -1, 1280), (3L, -1, -1)))
  }

  test("synthetic MPEG-audio corpus round-trip: planted params parse back exactly") {
    val docs = graft.Engine.Tables(spark, Sf0001).documents
    val parsed = graft.operators.Multimodal.syntheticMpegAudioCorpus(docs)
      .select(col("doc_id"),
        MpegAudioMetaExpr.mpeg_audio_meta(col("payload")).as("m"))
      .select(col("doc_id"), col("m.layer"), col("m.bitrate_kbps"),
        col("m.sample_rate"), col("m.channels"), col("m.duration_ms"))
      .collect()
    assert(parsed.nonEmpty && parsed.forall(!_.isNullAt(1)),
      "every planted payload must parse")
    val v1 = Seq(
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
    val v2 = Seq(
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
    parsed.foreach { r =>
      val id = r.getLong(0)
      val layer = (id % 3 + 1).toInt
      val brIdx = (id % 14 + 1).toInt
      val kbps = if (id % 2 == 0) v1(layer - 1)(brIdx) else v2(layer - 1)(brIdx)
      val srIdx = ((id / 3) % 3).toInt
      val rate = if (id % 2 == 0) Array(44100, 48000, 32000)(srIdx)
        else Array(22050, 24000, 16000)(srIdx)
      val channels = if (id % 4 == 3) 1 else 2
      val dur = (id % 983 + 100) * 8 / kbps
      assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))
        == ((layer, kbps, rate, channels, dur)), s"doc $id mismatch")
    }
  }

  test("synthetic AVC corpus round-trip: planted dims/profile parse back exactly") {
    val docs = graft.Engine.Tables(spark, Sf0001).documents
    val parsed = graft.operators.Multimodal.syntheticAvcCorpus(docs)
      .select(col("doc_id"), AvcSpsDimsExpr.avc_sps_dims(col("payload")).as("m"))
      .select(col("doc_id"), col("m.profile_idc"), col("m.level_idc"),
        col("m.width"), col("m.height"))
      .collect()
    assert(parsed.nonEmpty && parsed.forall(!_.isNullAt(1)),
      "every planted SPS must parse")
    parsed.foreach { r =>
      val id = r.getLong(0)
      val profile = (id % 3) match { case 0 => 66; case 1 => 77; case _ => 100 }
      assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) ==
        ((profile, ((id % 5 + 1) * 10).toInt,
          ((id % 320 + 1) * 2).toInt, ((id % 240 + 1) * 2).toInt)),
        s"doc $id mismatch")
    }
  }
}
