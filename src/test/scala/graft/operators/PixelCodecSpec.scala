package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** The real pixel path (JdkImageCodec): features derive from PIXELS, not
  * container bytes — so the same image in two containers featurizes
  * identically (the property the byte-stride fake cannot have) — and
  * resize is a real rescale whose output decodes back at the target dims.
  * decodeAll routes decodable streams to the pixel path and header-only
  * streams to the fallback. */
class PixelCodecSpec extends SparkTestBase {

  private def paint(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, ((x * 37 + y * 101) % 256) << 8 | x % 256); x += 1 }
      y += 1
    }
    img
  }

  private def enc(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out))
    out.toByteArray
  }

  test("features are pixel-derived: identical across PNG and BMP containers") {
    val img = paint(40, 30)
    val viaPng = Multimodal.JdkImageCodec.features(
      Multimodal.JdkImageCodec.read(enc(img, "png")))
    val viaBmp = Multimodal.JdkImageCodec.features(
      Multimodal.JdkImageCodec.read(enc(img, "bmp")))
    assert(viaPng.toSeq == viaBmp.toSeq)
    // and they respond to pixels: a different image featurizes differently
    val other = Multimodal.JdkImageCodec.features(
      Multimodal.JdkImageCodec.read(enc(paint(40, 31), "png")))
    assert(viaPng.toSeq != other.toSeq)
    // histogram buckets are a distribution over pixels
    assert(math.abs(viaPng.take(4).sum - 1.0f) < 1e-4)
  }

  test("resize really rescales: output decodes as PNG at exactly the target dims") {
    val resized = Multimodal.JdkImageCodec.resize(paint(64, 48), 16, 12)
    assert(graft.functions.ImageHeader.parse(resized) == ("image/png", 16, 12))
    val back = Multimodal.JdkImageCodec.read(resized)
    assert(back.getWidth == 16 && back.getHeight == 12)
  }

  test("decodeAll: decodable stream -> pixel path; header-only -> header fallback") {
    import spark.implicits._
    val full = enc(paint(20, 10), "png") // real, decodable
    val headerOnly = graft.operators.Multimodal
      .syntheticImageCorpus(Seq(3L).toDF("doc_id")) // planted header, no IDAT
      .select("payload").as[Array[Byte]].head()
    val media = Seq((1L, full, "x"), (2L, headerOnly, "x"))
      .toDF("doc_id", "payload", "mime")
    val rows = Multimodal.decodeAll(media).collect().sortBy(_.doc_id)
    assert(rows(0).mime == "image/png" && rows(0).width == 20 && rows(0).height == 10)
    // pixel-derived features: luminance-histogram head sums to ~1
    assert(math.abs(rows(0).feature.take(4).sum - 1.0f) < 1e-4)
    // header-only: dims from the header parse (doc_id 3 -> 4 x 4 planted),
    // features from the byte fallback (not a distribution)
    assert(rows(1).mime == "image/jpeg" || rows(1).mime == "image/png" ||
      rows(1).mime == "image/gif")
    assert(rows(1).width == 4 && rows(1).height == 4)
  }

  test("resizeAll routes per payload: real rescale for decodable, fake for others") {
    import spark.implicits._
    val media = Seq((1L, enc(paint(33, 21), "gif"), "img"),
      (2L, "not an image at all".getBytes, "txt")).toDF("doc_id", "payload", "mime")
    val out = Multimodal.resizeAll(media, 8, 8).orderBy("doc_id").collect()
    // decodable: the resized payload is a real 8x8 PNG
    val p0 = out(0).getAs[Array[Byte]]("payload")
    assert(graft.functions.ImageHeader.parse(p0) == ("image/png", 8, 8))
    // undecodable: deterministic byte-stride fake, definitely not a PNG
    val p1 = out(1).getAs[Array[Byte]]("payload")
    assert(graft.functions.ImageHeader.parse(p1) == null && p1.nonEmpty)
  }
}
