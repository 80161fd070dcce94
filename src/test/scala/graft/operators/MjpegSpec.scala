package graft.operators

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream

/** Real video-frame decode (MJPEG-in-AVI): the RIFF walk skips the hdrl
  * LIST and odd-size chunks, extracts 00dc/00db frame payloads, and each
  * frame ImageIO-decodes at its true dimensions; torn and non-AVI inputs
  * are refused. */
class MjpegSpec extends SparkTestBase {

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    out.toByteArray
  }

  test("build -> framePayloads round-trips the exact frame bytes") {
    val frames = Seq(jpeg(9, 7), jpeg(32, 24), jpeg(15, 15))
    val avi = Multimodal.MjpegAvi.build(frames)
    val got = Multimodal.MjpegAvi.framePayloads(avi)
    assert(got.size == 3)
    got.zip(frames).foreach { case (g, f) => assert(g.toSeq == f.toSeq) }
    // and the payloads are real JPEGs at the painted dims
    assert(got.map(f => graft.functions.ImageHeader.parse(f)._1).forall(_ == "image/jpeg"))
  }

  test("walk honesty: non-AVI null, torn frames skipped, WAV is not an AVI") {
    assert(Multimodal.MjpegAvi.framePayloads("not an avi".getBytes) == null)
    assert(Multimodal.MjpegAvi.framePayloads(null) == null)
    // a RIFF that is WAVE, not AVI
    val wav = Array[Byte]('R', 'I', 'F', 'F', 4, 0, 0, 0, 'W', 'A', 'V', 'E')
    assert(Multimodal.MjpegAvi.framePayloads(wav) == null)
    // truncate an AVI mid-frame: complete frames before the tear survive
    val avi = Multimodal.MjpegAvi.build(Seq(jpeg(8, 8), jpeg(8, 8)))
    val torn = avi.take(avi.length - 5)
    val got = Multimodal.MjpegAvi.framePayloads(torn)
    assert(got != null && got.size == 1)
  }

  test("videoFrames decodes every planted frame at exact dims; junk drops out") {
    import spark.implicits._
    val avi = Multimodal.MjpegAvi.build(Seq(jpeg(20, 10), jpeg(20, 10)))
    val media = Seq((7L, avi), (8L, "junk".getBytes)).toDF("doc_id", "payload")
    val rows = Multimodal.videoFrames(media).orderBy("frame_idx").collect()
    assert(rows.length == 2)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == 7L && r.getLong(1) == i &&
        r.getInt(2) == 20 && r.getInt(3) == 10)
    }
  }

  test("tone-of-qe5h: synthetic corpus round-trips planted frame counts and dims") {
    val docs = Engine.Tables(spark, Sf0001).documents.limit(60)
    val got = Multimodal.videoFrames(Multimodal.syntheticMjpegCorpus(docs))
    val bad = got.filter(
      col("width") =!= (col("doc_id") % 64 + 8).cast("int") ||
      col("height") =!= (col("doc_id") % 48 + 8).cast("int") ||
      col("frame_idx") >= col("doc_id") % 5 + 1)
    assert(bad.count() == 0)
    val counts = got.groupBy("doc_id").count()
      .filter(col("count") =!= col("doc_id") % 5 + 1)
    assert(counts.count() == 0 && got.select("doc_id").distinct().count() == 60)
  }
}
