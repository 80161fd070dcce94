package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VideoDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }
  private def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }
  private def avi(frames: Array[Byte]*): Array[Byte] =
    Multimodal.MjpegAvi.build(frames)

  test("contentHash: container/encoder-invariant, frame-order/count/pixel-sensitive, refuses partial reads") {
    val f1 = solid(12, 10, 0x336699); val f2 = solid(12, 10, 0x996633)
    val base = VideoDedup.contentHash(avi(enc(f1, "png"), enc(f2, "png")))
    assert(base._1 == 2 && base._2 != null)
    // frame encoder changes, container JUNK chunk: same hash
    assert(VideoDedup.contentHash(avi(enc(f1, "bmp"), enc(f2, "bmp"))) == base,
      "BMP frame spelling must hash like the PNG spelling")
    assert(VideoDedup.contentHash(Multimodal.MjpegAvi.build(
      Seq(enc(f1, "png"), enc(f2, "png")), junk = true)) == base,
      "a JUNK alignment chunk is a pure container spelling")
    // frame ORDER is part of the content
    assert(VideoDedup.contentHash(avi(enc(f2, "png"), enc(f1, "png")))._2 != base._2)
    // frame COUNT too — a prefix clip is not an exact dup
    assert(VideoDedup.contentHash(avi(enc(f1, "png")))._2 != base._2)
    // one pixel nudged: different clip
    val f1n = solid(12, 10, 0x336699); f1n.setRGB(3, 3, 0x336698)
    assert(VideoDedup.contentHash(avi(enc(f1n, "png"), enc(f2, "png")))._2 != base._2)
    // not an AVI → null; an AVI with one undecodable frame → null (a
    // partial signature would merge clips the engine could not read)
    assert(VideoDedup.contentHash("not a riff".getBytes("UTF-8")) == ((-1, null)))
    assert(VideoDedup.contentHash(null) == ((-1, null)))
    val broken = avi(enc(f1, "png"), "garbage frame".getBytes("UTF-8"))
    assert(VideoDedup.contentHash(broken) == ((2, null)))
  }

  test("dedupByFrames: four byte-level spellings collapse; byte dedup provably cannot; refusals are singletons") {
    val docs = spark.range(12).select(col("id").as("doc_id"))
    val media = VideoDedup.syntheticDupVideoCorpus(docs)
    val out = VideoDedup.dedupByFrames(media)
      .select("doc_id", "n_frames", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    val want = (0L until 12L).map { id =>
      val g = id / 4
      (id, VideoDedup.framesOf(g), g * 4, if (id % 4 == 0) 1 else 0)
    }
    assert(out == want)
    // the spellings really differ at the BYTE level inside each group —
    // the collapse is the decode's work, not trivial byte equality
    val nPayloads = media.select(md5(col("payload"))).distinct().count()
    assert(nPayloads == 12, s"expected 12 distinct byte spellings, got $nPayloads")
    // refusal rows survive as their own groups
    val mixed = Seq(
      (100L, avi(enc(solid(12, 10, 0x010203), "png"))),
      (101L, "not a riff".getBytes("UTF-8")),
      (102L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val kept = VideoDedup.dedupByFrames(mixed)
      .filter(col("is_kept") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L, 101L, 102L))
  }

  test("containmentPairs: noise and trimmed spellings pair contained, cross-group never; boundary refuses") {
    val docs = spark.range(12).select(col("id").as("doc_id"))
    val media = VideoDedup.syntheticNearDupVideoCorpus(docs)
    val got = VideoDedup.containmentPairs(media, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    val want = (0 until 3).flatMap { g =>
      val n = VideoDedup.framesOf(g.toLong).toLong
      val ids = (g * 4 until g * 4 + 4).map(_.toLong)
      for (a <- ids; b <- ids if a < b) yield {
        val trimmed = b % 4 == 3 // a is never spelling 3 (a < b)
        val m = if (trimmed) n - 1 else n
        (a, b, n, m, m, m, true)
      }
    }.toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // the exact content hashes split inside each group (pixel noise +
    // trim): the perceptual pass is doing work the exact pass cannot
    val nExact = VideoDedup.videoSignatures(media)
      .toDF().select("content_hash").distinct().count()
    assert(nExact == 9, s"expected 3 groups x {full, noisy, trimmed}, got $nExact")
    intercept[IllegalArgumentException] {
      VideoDedup.containmentPairs(media, maxHamming = 4)
    }
  }

  test("containment semantics: a shared-frame pair below full containment reports contained=false") {
    // clip A = frames {f1, f2}; clip B = {f1, f3}: the shared frame makes
    // them candidates, but neither clip's frames are fully covered
    val f1 = ImageDedup.paint(ImageDedup.groupGrid(1L), cell = 4, perturb = false)
    val f2 = ImageDedup.paint(ImageDedup.groupGrid(9L), cell = 4, perturb = false)
    val f3 = ImageDedup.paint(ImageDedup.groupGrid(17L), cell = 4, perturb = false)
    val rows = Seq(
      (0L, avi(enc(f1, "png"), enc(f2, "png"))),
      (1L, avi(enc(f1, "png"), enc(f3, "png"))),
      (2L, avi(enc(f1, "png")))) // the 1-frame clip IS contained in both
      .toDF("doc_id", "payload")
    val got = VideoDedup.containmentPairs(rows, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(6))).toSet
    assert(got == Set((0L, 1L, false), (0L, 2L, true), (1L, 2L, true)))
    // a LOOPED clip does not contain a shorter clip it only partially
    // covers: [f1,f1,f1] vs [f1,f2] — every long-side frame matches f1,
    // but short-side f2 has no counterpart
    val looped = Seq(
      (0L, avi(enc(f1, "png"), enc(f2, "png"))),
      (1L, avi(enc(f1, "png"), enc(f1, "png"), enc(f1, "png"))))
      .toDF("doc_id", "payload")
    val lp = VideoDedup.containmentPairs(looped, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(6))).toSet
    assert(lp == Set((0L, 1L, false)),
      s"a looped cover of one frame must not read as containment: $lp")
    // all-or-nothing refusal: a clip with one unreadable frame never
    // pairs (partial-read containment would merge what was not read)
    val broken = Seq(
      (0L, avi(enc(f1, "png"), enc(f2, "png"))),
      (3L, avi(enc(f1, "png"), "garbage".getBytes("UTF-8"))))
      .toDF("doc_id", "payload")
    assert(VideoDedup.containmentPairs(broken, maxHamming = 2).count() == 0)
  }

  test("animated GIF is a first-class video container: AVI and GIF spellings of one " +
    "clip hash identically; dup corpus collapses across container families (r15)") {
    val f1 = solid(12, 10, 0x336699); val f2 = solid(12, 10, 0x996633)
    val viaAvi = VideoDedup.contentHash(avi(enc(f1, "png"), enc(f2, "png")))
    val viaGif = VideoDedup.contentHash(Multimodal.AnimatedGif.build(Seq(f1, f2)))
    assert(viaGif == viaAvi,
      "a GIF spelling of the same frame sequence must hash like the AVI spelling")
    // frameDHashes reads GIF frames too (incl. under a budget)
    val gifClip = Seq((0L, Multimodal.AnimatedGif.build(Seq(f1, f2)))).toDF("doc_id", "payload")
    assert(VideoDedup.frameDHashes(gifClip).count() == 2)
    assert(VideoDedup.frameDHashes(gifClip, maxFrames = 1).count() == 1)
    // a SINGLE-frame GIF is an image, not a video: contentHash refuses
    assert(VideoDedup.contentHash(Multimodal.AnimatedGif.build(Seq(f1))) == ((-1, null)))
    // the dup corpus's spelling 1 is now the GIF spelling — groups still
    // collapse to the min-id survivor across container families
    val docs = spark.range(8).select(col("id").as("doc_id"))
    val media = VideoDedup.syntheticDupVideoCorpus(docs)
    val gifRows = media.filter(col("doc_id") % 4 === 1).collect()
    gifRows.foreach { r =>
      assert(Multimodal.AnimatedGif.isGif(r.getAs[Array[Byte]]("payload")),
        s"doc ${r.getLong(0)}: spelling 1 must be an animated GIF")
    }
    val verdicts = VideoDedup.dedupByFrames(media)
      .select("doc_id", "survivor_id", "is_kept").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(verdicts == (0L until 8L).map(id => (id, id / 4 * 4, if (id % 4 == 0) 1 else 0)).toSet)
  }

  test("frame budget: maxFrames caps the per-clip decode at a deterministic even stride") {
    // r14 verdict #3: the budget must bound the frame rows (and decodes)
    // at the source, deterministically, without touching under-budget clips
    val frames = (0 until 20).map(i =>
      enc(ImageDedup.paint(ImageDedup.groupGrid(100L + i), cell = 4, perturb = false), "png"))
    val clip = Seq((0L, avi(frames: _*))).toDF("doc_id", "payload")
    val sampled = VideoDedup.frameDHashes(clip, maxFrames = 12)
      .collect().map(_.frame_idx).toSeq.sorted
    assert(sampled == (0 until 12).map(k => k * 20 / 12),
      s"expected the even-stride sample of 20 frames at budget 12, got $sampled")
    assert(sampled.head == 0, "the stride must always include frame 0")
    // under-budget clips are untouched; budget 0 keeps every frame
    val small = Seq((1L, avi(frames.take(3): _*))).toDF("doc_id", "payload")
    assert(VideoDedup.frameDHashes(small, maxFrames = 12)
      .collect().map(_.frame_idx).toSeq.sorted == Seq(0, 1, 2))
    assert(VideoDedup.frameDHashes(clip, 0).count() == 20)
    // the registered qe73 budget (12) is invisible on the planted corpus
    // (<= 4 frames/clip), so the oracle stays exact
    val docs = spark.range(8).select(col("id").as("doc_id"))
    val media = VideoDedup.syntheticNearDupVideoCorpus(docs)
    val a = VideoDedup.containmentPairs(media, 2, maxFrames = 12)
      .collect().map(_.toSeq).toSet
    val b = VideoDedup.containmentPairs(media, 2).collect().map(_.toSeq).toSet
    assert(a == b, "budget must not change results below the cap")
    intercept[IllegalArgumentException] {
      VideoDedup.frameDHashes(clip, maxFrames = -1)
    }
  }

  test("plan hygiene: the frame band join is an equi-join, never a cartesian/nested-loop") {
    val docs = spark.range(16).select(col("id").as("doc_id"))
    val media = VideoDedup.syntheticNearDupVideoCorpus(docs)
    val pairs = VideoDedup.containmentPairs(media, maxHamming = 2)
    pairs.collect() // drive this QueryExecution so AQE finalizes
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"frame candidates must equi-join on (band, bucket):\n$plan")
  }
}
