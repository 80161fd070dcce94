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
}
