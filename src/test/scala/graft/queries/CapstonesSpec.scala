package graft.queries

import graft.SparkTestBase
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The crawl media-dedup capstone (qe75): the oracle certifies the happy
  * path (mixed corpus → triage → three legs → arithmetic survivors);
  * this spec pins the routing edges the oracle cannot show — unknown
  * payloads surviving as singletons, exactly-once routing, and the
  * in-place kind projection never shuffling payloads. */
class CapstonesSpec extends SparkTestBase {
  import spark.implicits._

  test("mediaKind routes every planted family; unknowns stay unknown") {
    val docs = spark.range(24).select(col("id").as("doc_id"))
    val media = Multimodal.mixedDupMediaCorpus(docs)
    val kinds = media.select(col("doc_id"),
        Multimodal.mediaKind(col("payload")).as("kind"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 24L).foreach { id =>
      val want = ((id / 4) % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(kinds(id) == want, s"doc $id routed ${kinds(id)}, want $want")
    }
    val junk = Seq((100L, "not media at all".getBytes("UTF-8")),
      (101L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val ks = junk.select(Multimodal.mediaKind(col("payload")).as("k"))
      .collect().map(_.getString(0)).toSeq
    assert(ks == Seq("unknown", "unknown"))
  }

  test("crawlMediaDedup: exactly one verdict per doc; unknowns kept as singletons") {
    val docs = spark.range(24).select(col("id").as("doc_id"))
    val media = Multimodal.mixedDupMediaCorpus(docs)
      .unionByName(Seq((100L, "junk".getBytes("UTF-8"), "application/octet-stream"))
        .toDF("doc_id", "payload", "mime"))
    val rows = Capstones.crawlMediaDedup(media)
      .select("doc_id", "kind", "survivor_id", "is_kept")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3))))
    // exactly once: 24 planted + 1 unknown, no loss, no double-routing —
    // assert on the ROW count (a map would collapse a doubled doc)
    assert(rows.length == 25, s"expected 25 verdicts, got ${rows.length}")
    val out = rows.toMap
    assert(out.size == 25)
    (0L until 24L).foreach { id =>
      val g = id / 4
      val kind = ((g % 3): @unchecked) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"
      }
      assert(out(id) == ((kind, g * 4, if (id % 4 == 0) 1 else 0)),
        s"doc $id: ${out(id)}")
    }
    assert(out(100L) == (("unknown", 100L, 1)))
  }

  test("router: FLAC spellings route audio and collapse onto their WAV twins (r17 review)") {
    // the gap the AU branch closed for µ-law, re-checked for FLAC: the
    // sample decode existed but triage refused "fLaC", so the capstone
    // kept FLAC docs as unknown singletons instead of deduping them
    val docs = spark.range(8).select(col("id").as("doc_id"))
    val media = graft.operators.AudioDedup.syntheticDupAudioCorpusFlac(docs)
    val out = Capstones.crawlMediaDedup(media)
      .select("doc_id", "kind", "survivor_id", "is_kept")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    (0L until 8L).foreach { id =>
      assert(out(id) == (("audio", id - id % 2, (1 - id % 2).toInt)),
        s"doc $id: ${out(id)}")
    }
  }

  test("router: two animations sharing frame 0 route video and never merge (r15 GIF triage)") {
    // without the animated-GIF-before-image precedence both payloads
    // would decode as their FIRST frame and pixel-hash-merge — the exact
    // hazard the router refinement closes
    def solid(rgb: Int) = {
      val img = new java.awt.image.BufferedImage(12, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 10).foreach(y => (0 until 12).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    val shared = solid(0x336699)
    val a = Multimodal.AnimatedGif.build(Seq(shared, solid(0x996633)))
    val b = Multimodal.AnimatedGif.build(Seq(shared, solid(0x113355)))
    val rows = Capstones.crawlMediaDedup(
        Seq((0L, a, "image/gif"), (1L, b, "image/gif"))
          .toDF("doc_id", "payload", "mime"))
      .select("doc_id", "kind", "is_kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set((0L, "video", 1), (1L, "video", 1)),
      s"distinct animations sharing frame 0 must both survive as video: $rows")
    // TORN animations (trailer cut off mid-stream) must refuse — frame 0
    // of each still decodes, and keying on it would merge what was not
    // read; both survive as null-key singletons instead
    val torn = Capstones.crawlMediaDedup(
        Seq((0L, a.dropRight(1), "image/gif"), (1L, b.dropRight(1), "image/gif"))
          .toDF("doc_id", "payload", "mime"))
      .select("doc_id", "is_kept")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(torn == Set((0L, 1), (1L, 1)),
      s"torn animations must refuse to null-key singletons, never merge: $torn")
  }

  test("appendKeySet: append(batch1) then dedup(batch2) == dedup against the union key set (r15)") {
    val docs = spark.range(60).select(col("id").as("doc_id"))
    val g = expr("doc_id div 4")
    val stored = Multimodal.mixedDupMediaCorpus(docs.where(g % 5 =!= 2 && g % 5 =!= 3))
    val batch1 = Multimodal.mixedDupMediaCorpus(docs.where(g % 5 === 2))
    val batch2 = Multimodal.mixedDupMediaCorpus(
      docs.where(g % 5 === 3 || col("doc_id") % 20 === 5 || col("doc_id") % 20 === 9))
    // evolve path: keys(stored) ∪ keys(batch1), history never re-decoded
    val evolved = Capstones.appendKeySet(Capstones.mediaKeySet(stored), batch1)
    // ground truth: the key set fitted from scratch over the union corpus
    val union = Capstones.mediaKeySet(stored.unionByName(batch1))
    assert(evolved.collect().map(_.getString(0)).toSet ==
      union.collect().map(_.getString(0)).toSet,
      "appended key set must equal the from-scratch union key set")
    val viaAppend = Capstones.crawlMediaDedupAgainst(batch2, evolved)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getInt(3))).toSet
    val viaUnion = Capstones.crawlMediaDedupAgainst(batch2, union)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getInt(3))).toSet
    assert(viaAppend == viaUnion)
    // the batch1 stray (doc_id%20==9, a re-crawl of batch-1 content) is
    // dropped ONLY because the append landed — the claim qe76b registers
    val stray = viaAppend.find(_._1 == 9L)
    assert(stray.exists(t => t._3 && t._4 == 0),
      s"batch1 re-crawl must read seen=true, is_kept=0 after append: $stray")
  }

  test("crawlMediaDedupAgainst: stored keys drop re-crawls, new content dedups within the batch, refusals survive") {
    // stored corpus: groups 0..2 (image/audio/video); increment: one
    // re-crawled spelling per stored group + ALL of new groups 3..5 +
    // one refused payload
    val stored = Multimodal.mixedDupMediaCorpus(
      spark.range(12).select(col("id").as("doc_id")))
    val inc = Multimodal.mixedDupMediaCorpus(
        spark.range(24).filter(col("id") >= 12 || col("id") % 4 === 1)
          .select(col("id").as("doc_id")))
      .unionByName(Seq((200L, "junk".getBytes("UTF-8"), "application/octet-stream"))
        .toDF("doc_id", "payload", "mime"))
    val keys = Capstones.mediaKeySet(stored)
    val rows = Capstones.crawlMediaDedupAgainst(inc, keys)
      .select("doc_id", "kind", "seen", "is_kept")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getInt(3))))
    assert(rows.length == 16, s"3 strays + 12 new + 1 refused, got ${rows.length}")
    val out = rows.toMap
    // re-crawled spellings of stored groups: seen, never kept
    Seq(1L, 5L, 9L).foreach { id =>
      val kind = Seq("image", "audio", "video")((id / 4).toInt % 3)
      assert(out(id) == ((kind, true, 0)), s"stray $id: ${out(id)}")
    }
    // new groups 3..5: unseen; min-id survivor per group
    (12L until 24L).foreach { id =>
      val kind = Seq("image", "audio", "video")((id / 4).toInt % 3)
      assert(out(id) == ((kind, false, if (id % 4 == 0) 1 else 0)),
        s"new doc $id: ${out(id)}")
    }
    // refused payloads match no frozen key and survive as singletons
    assert(out(200L) == (("unknown", false, 1)))
  }
}
