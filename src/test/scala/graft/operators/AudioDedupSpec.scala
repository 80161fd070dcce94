package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AudioDedupSpec extends SparkTestBase {
  import spark.implicits._

  // drive the corpus writers directly for single payloads
  private def corpusBytes(ids: Seq[Long]): Map[Long, Array[Byte]] =
    AudioDedup.syntheticDupAudioCorpus(ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap

  test("sample hash is container-invariant: WAV/AIFF/junk-chunk spellings of one " +
    "recording hash identically, across 8-bit sign storages and both endiannesses") {
    // group 0: 8-bit (WAV stores unsigned, AIFF signed); group 1: 16-bit
    // (LE vs BE) — all four spellings per group must collide
    val bytes = corpusBytes(0L until 8L)
    (0 to 1).foreach { g =>
      val hashes = (g * 4 until g * 4 + 4)
        .map(i => AudioDedup.sampleHash(bytes(i.toLong)))
      assert(hashes.forall(_ != null), s"group $g: a spelling failed to decode")
      assert(hashes.map(_.sample_hash).distinct.size == 1,
        s"group $g spellings hash apart: ${hashes.map(_.sample_hash)}")
      assert(hashes.head.n_frames == g % 40 + 5)
    }
    // and distinct groups hash apart (different planted waveforms)
    assert(AudioDedup.sampleHash(bytes(0L)).sample_hash !=
      AudioDedup.sampleHash(bytes(4L)).sample_hash)
  }

  test("one flipped sample, a different rate, or a different channel count changes the hash") {
    val base = corpusBytes(Seq(4L))(4L) // group 1: 16-bit WAV
    val sig = AudioDedup.sampleHash(base)
    // flip the last sample's low byte (data sits at the buffer tail)
    val mut = base.clone(); mut(mut.length - 2) = (mut(mut.length - 2) ^ 1).toByte
    assert(AudioDedup.sampleHash(mut).sample_hash != sig.sample_hash)
    // rate is identity: same bytes with a patched fmt-chunk rate field
    // must hash apart (fmt rate u32le sits at offset 24 in a junkless WAV)
    val rer = base.clone(); rer(24) = (rer(24) ^ 1).toByte
    val rsig = AudioDedup.sampleHash(rer)
    assert(rsig == null || rsig.sample_hash != sig.sample_hash)
  }

  test("dedupBySamples: spellings collapse to min-id survivor; undecodable rows are singletons") {
    val media = AudioDedup.syntheticDupAudioCorpus((0L until 8L).toDF("doc_id"))
      .unionByName(Seq((8L, "not audio".getBytes("UTF-8"), "application/octet-stream"),
        (9L, null.asInstanceOf[Array[Byte]], "application/octet-stream"))
        .toDF("doc_id", "payload", "mime"))
    val out = AudioDedup.dedupBySamples(media)
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((0L, 0L, 1), (1L, 0L, 0), (2L, 0L, 0), (3L, 0L, 0),
      (4L, 4L, 1), (5L, 4L, 0), (6L, 4L, 0), (7L, 4L, 0),
      (8L, 8L, 1), (9L, 9L, 1)))
  }
}
