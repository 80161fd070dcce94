package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
  private def bmp(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  test("pixelHash is container-invariant and pixel-sensitive") {
    val a = solid(12, 10, 0x336699)
    assert(ImageDedup.pixelHash(a) ==
      ImageDedup.pixelHash(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bmp(a)))),
      "PNG-decoded and BMP-decoded hashes of the same raster must match")
    val b = solid(12, 10, 0x336699)
    b.setRGB(3, 3, 0x336698) // one pixel, one bit of blue
    assert(ImageDedup.pixelHash(a) != ImageDedup.pixelHash(b))
  }

  test("dHash64: gradient direction sets bits; single-pixel noise does not flip them") {
    // left-dark / right-bright: every horizontal comparison is 'brighter'
    val img = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 36) {
        val l = 40 + (x / 4) * 20 // 9 cells stepping +20
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    assert(ImageDedup.dHash64(img) == -1L, "all 64 gradient bits must be set")
    val noisy = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = noisy.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
    noisy.setRGB(5, 5, 0x000000) // one black pixel in a 16-px cell
    assert(ImageDedup.dHash64(noisy) == -1L,
      "a single-pixel perturbation must not flip a 20-step cell comparison")
    // and the reverse gradient flips every bit
    val rev = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    y = 0
    while (y < 32) {
      var x = 0
      while (x < 36) {
        val l = 200 - (x / 4) * 20
        rev.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    assert(ImageDedup.dHash64(rev) == 0L)
  }

  test("sub-grid images refuse the dHash (tracking-pixel hot-bucket guard) but keep the pixel hash") {
    val rows = Seq(
      (0L, png(solid(1, 1, 0xFFFFFF))),   // the classic 1x1 tracking pixel
      (1L, png(solid(8, 8, 0x123456))),   // width below the 9-col grid
      (2L, png(solid(36, 32, 0x123456)))) // full-grid solid: hashes fine
      .toDF("doc_id", "payload")
    val sigs = ImageDedup.imageSignatures(rows).collect()
      .map(s => s.doc_id -> ((s.pixel_hash != null, s.dhash.isDefined))).toMap
    assert(sigs(0L) == ((true, false)) && sigs(1L) == ((true, false)),
      "sub-grid images must keep exact pixel dedup but refuse the perceptual hash")
    assert(sigs(2L) == ((true, true)))
    // and nearDupPairs silently excludes them instead of pairing every
    // tracking pixel with every other
    assert(ImageDedup.nearDupPairs(rows.filter(col("doc_id") < 2), 2).count() == 0)
  }

  test("banding pigeonhole: Hamming <= 3 always shares a band; crafted 4-bit spread does not") {
    def bands(x: Long): Set[(Int, Long)] =
      (0 until 4).map(b => (b, (x >>> (b * 16)) & 0xFFFFL)).toSet
    val base = 0x0123456789ABCDEFL
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      var flipped = base
      val nBits = rnd.nextInt(4) // 0..3 flips
      (0 until nBits).foreach(_ => flipped ^= 1L << rnd.nextInt(64))
      assert(bands(base).intersect(bands(flipped)).nonEmpty,
        f"hamming<=3 pair lost by banding: $flipped%016x")
    }
    // one flip in EACH band: no shared band — the boundary the require guards
    val spread = base ^ 1L ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)
    assert(bands(base).intersect(bands(spread)).isEmpty)
    // pair-band guarantee (the maxHamming <= 2 scale path): any <= 2 flips
    // leave at least one of the C(4,2)=6 band PAIRS fully clean
    def pairBands(x: Long): Set[(Int, Int, Long, Long)] =
      (for (a <- 0 until 4; b <- a + 1 until 4)
        yield (a, b, (x >>> (a * 16)) & 0xFFFFL, (x >>> (b * 16)) & 0xFFFFL)).toSet
    (0 until 500).foreach { _ =>
      var flipped = base
      (0 until rnd.nextInt(3)).foreach(_ => flipped ^= 1L << rnd.nextInt(64))
      assert(pairBands(base).intersect(pairBands(flipped)).nonEmpty,
        f"hamming<=2 pair lost by pair-banding: $flipped%016x")
    }
    // 3 flips across 3 distinct bands: no clean pair — exactly why
    // maxHamming == 3 stays on single bands
    val spread3 = base ^ 1L ^ (1L << 16) ^ (1L << 32)
    assert(pairBands(base).intersect(pairBands(spread3)).isEmpty)
  }

  test("dedupByPixels: spellings collapse, undecodable rows are singletons") {
    val a = solid(10, 8, 0x884422)
    val rows = Seq(
      (0L, png(a)), (1L, bmp(a)),                  // same raster
      (2L, png(solid(10, 8, 0x884423))),           // different raster
      (3L, "not an image".getBytes("UTF-8")),      // undecodable
      (4L, null.asInstanceOf[Array[Byte]]))        // null payload
      .toDF("doc_id", "payload")
    val out = ImageDedup.dedupByPixels(rows)
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((0L, 0L, 1), (1L, 0L, 0), (2L, 2L, 1), (3L, 3L, 1), (4L, 4L, 1)))
  }

  test("plan hygiene: the band join is an equi-join, never a cartesian/nested-loop") {
    val docs = spark.range(16).select(col("id").as("doc_id"))
    val media = ImageDedup.syntheticNearDupImageCorpus(docs)
    val pairs = ImageDedup.nearDupPairs(media, maxHamming = 2)
    pairs.collect() // drive this QueryExecution so AQE finalizes
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"band candidates must equi-join on (band, bucket):\n$plan")
  }

  test("nearDupPairs: perturbed spellings pair at Hamming 0, distinct groups never pair; " +
    "maxHamming above the pigeonhole boundary refuses") {
    val docs = spark.range(12).select(col("id").as("doc_id"))
    val media = ImageDedup.syntheticNearDupImageCorpus(docs)
    val pairs = ImageDedup.nearDupPairs(media, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (0 until 3).flatMap { g =>
      val ids = (g * 4 until g * 4 + 4).map(_.toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b, 0)
    }.toSet
    assert(pairs == want, s"missing=${(want -- pairs).take(5)} extra=${(pairs -- want).take(5)}")
    // and the pixel hashes really did split inside each group (2 + 2):
    // the perceptual pass is doing work the exact pass cannot
    val nPixelGroups = ImageDedup.imageSignatures(media)
      .toDF().select("pixel_hash").distinct().count()
    assert(nPixelGroups == 6, s"expected 3 groups x 2 pixel variants, got $nPixelGroups")
    intercept[IllegalArgumentException] {
      ImageDedup.nearDupPairs(media, maxHamming = 4)
    }
  }
}
