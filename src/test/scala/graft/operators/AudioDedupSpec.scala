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
      assert(hashes.head.n_frames == g % 40 + 15) // 10 id frames + wave
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

  test("G.711 cross-encoding collapse (r16): µ-law/A-law WAV spellings hash " +
    "identically to the 16-bit PCM spelling of their decoded values; laws never cross-merge") {
    val bytes = AudioDedup.syntheticDupAudioCorpusCompanded((0L until 8L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    (0 to 1).foreach { g =>
      val base = g * 4L
      val pcmU = AudioDedup.sampleHash(bytes(base))
      val ulaw = AudioDedup.sampleHash(bytes(base + 1))
      val pcmA = AudioDedup.sampleHash(bytes(base + 2))
      val alaw = AudioDedup.sampleHash(bytes(base + 3))
      assert(Seq(pcmU, ulaw, pcmA, alaw).forall(_ != null),
        s"group $g: a companded spelling failed to decode")
      assert(pcmU.sample_hash == ulaw.sample_hash,
        s"group $g: µ-law spelling hashes apart from its PCM twin")
      assert(pcmA.sample_hash == alaw.sample_hash,
        s"group $g: A-law spelling hashes apart from its PCM twin")
      // the two laws are different recordings (odd vs even n_frames by
      // construction) — they must never merge
      assert(pcmU.sample_hash != pcmA.sample_hash)
      assert(pcmU.n_frames % 2 == 1 && pcmA.n_frames % 2 == 0)
      // triage agreement: the capstone router sniffs through AudioHeader,
      // which must accept the G.711 container so the crawl leg routes it
      // to this decode rather than a null-key singleton
      assert(graft.functions.AudioHeader.parse(bytes(base + 1)) != null)
      assert(graft.functions.AudioHeader.parse(bytes(base + 3)) != null)
    }
    // survivors are pure doc_id arithmetic: min-id per {2k, 2k+1} pair
    val out = AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpusCompanded((0L until 8L).toDF("doc_id")))
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == (0L until 8L).map(id => (id, id - id % 2, (1 - id % 2).toInt)))
  }

  test("IMA ADPCM cross-encoding collapse (r16): the predictive-codec spelling hashes " +
    "identically to the 16-bit PCM spelling of its decoded stream; triage accepts tag 17") {
    val bytes = AudioDedup.syntheticDupAudioCorpusAdpcm((0L until 8L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    (0 to 3).foreach { g =>
      val pcm = AudioDedup.sampleHash(bytes(g * 2L))
      val adp = AudioDedup.sampleHash(bytes(g * 2L + 1))
      assert(pcm != null && adp != null, s"group $g: a spelling failed to decode")
      assert(pcm.sample_hash == adp.sample_hash,
        s"group $g: ADPCM spelling hashes apart from its PCM twin")
      assert(pcm.n_frames == adp.n_frames && pcm.channels == adp.channels)
      // triage agreement: the capstone router sniffs through AudioHeader
      assert(graft.functions.AudioHeader.parse(bytes(g * 2L + 1)) != null)
    }
    // distinct groups stay distinct (the id-block predictors carry g's
    // bits verbatim into the decoded stream)
    assert(AudioDedup.sampleHash(bytes(1L)).sample_hash !=
      AudioDedup.sampleHash(bytes(3L)).sample_hash)
    // survivors are pure doc_id arithmetic: min-id per {2k, 2k+1} pair
    val out = AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpusAdpcm((0L until 8L).toDF("doc_id")))
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == (0L until 8L).map(id => (id, id - id % 2, (1 - id % 2).toInt)))
  }

  test("MS ADPCM cross-encoding collapse (r17): the 2nd-order predictive spelling hashes " +
    "identically to the 16-bit PCM spelling of its decoded stream; triage accepts tag 2") {
    // 14 pairs so the planted predictor-index rotation ((g+blk+c) % 7)
    // exercises every one of the 7 standard coefficient pairs
    val n = 28L
    val bytes = AudioDedup.syntheticDupAudioCorpusMsAdpcm((0L until n).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    (0 until (n / 2).toInt).foreach { g =>
      val pcm = AudioDedup.sampleHash(bytes(g * 2L))
      val adp = AudioDedup.sampleHash(bytes(g * 2L + 1))
      assert(pcm != null && adp != null, s"group $g: a spelling failed to decode")
      assert(pcm.sample_hash == adp.sample_hash,
        s"group $g: MS ADPCM spelling hashes apart from its PCM twin")
      assert(pcm.n_frames == adp.n_frames && pcm.channels == adp.channels)
      // triage agreement: the capstone router sniffs through AudioHeader
      assert(graft.functions.AudioHeader.parse(bytes(g * 2L + 1)) != null)
    }
    // distinct groups stay distinct (the id-block history samples carry
    // g's bits verbatim into the decoded stream)
    assert(AudioDedup.sampleHash(bytes(1L)).sample_hash !=
      AudioDedup.sampleHash(bytes(3L)).sample_hash)
    // survivors are pure doc_id arithmetic: min-id per {2k, 2k+1} pair
    val out = AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpusMsAdpcm((0L until 8L).toDF("doc_id")))
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == (0L until 8L).map(id => (id, id - id % 2, (1 - id % 2).toInt)))
  }

  test("AIFF-C ima4 cross-container collapse (r17): the Apple IMA packetization hashes " +
    "identically to the 16-bit PCM spelling of its decoded stream; triage accepts ima4") {
    // 28 docs = 14 pairs: covers all (ch, rate) rotations plus both
    // truncated and whole final packets (g%7 spans 0..6 twice)
    val n = 28L
    val bytes = AudioDedup.syntheticDupAudioCorpusIma4((0L until n).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    (0 until (n / 2).toInt).foreach { g =>
      val pcm = AudioDedup.sampleHash(bytes(g * 2L))
      val ima = AudioDedup.sampleHash(bytes(g * 2L + 1))
      assert(pcm != null && ima != null, s"group $g: a spelling failed to decode")
      assert(pcm.sample_hash == ima.sample_hash,
        s"group $g: ima4 spelling hashes apart from its PCM twin")
      assert(pcm.n_frames == ima.n_frames && pcm.channels == ima.channels)
      // triage agreement: the capstone router sniffs through AudioHeader
      assert(graft.functions.AudioHeader.parse(bytes(g * 2L + 1)) != null)
    }
    // distinct groups stay distinct (the id packets' 9-bit predictor
    // fields land in the decoded stream verbatim)
    assert(AudioDedup.sampleHash(bytes(1L)).sample_hash !=
      AudioDedup.sampleHash(bytes(3L)).sample_hash)
    // survivors are pure doc_id arithmetic: min-id per {2k, 2k+1} pair
    val out = AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpusIma4((0L until 8L).toDF("doc_id")))
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == (0L until 8L).map(id => (id, id - id % 2, (1 - id % 2).toInt)))
  }

  test("Sun AU cross-container collapse (r17): AU mu-law and AU big-endian s16 spellings hash " +
    "identically to their WAV twins; triage accepts .snd") {
    val n = 16L
    val bytes = AudioDedup.syntheticDupAudioCorpusAu((0L until n).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    (0 until (n / 2).toInt).foreach { p =>
      val wav = AudioDedup.sampleHash(bytes(p * 2L))
      val au = AudioDedup.sampleHash(bytes(p * 2L + 1))
      assert(wav != null && au != null, s"pair $p: a spelling failed to decode")
      assert(wav.sample_hash == au.sample_hash,
        s"pair $p: AU spelling hashes apart from its WAV twin")
      assert(wav.n_frames == au.n_frames && wav.channels == au.channels)
      // triage agreement: the capstone router sniffs through AudioHeader
      assert(graft.functions.AudioHeader.parse(bytes(p * 2L + 1)) != null)
    }
    // the two recordings of a group never merge (frame-count parity)
    assert(AudioDedup.sampleHash(bytes(0L)).sample_hash !=
      AudioDedup.sampleHash(bytes(2L)).sample_hash)
    // survivors are pure doc_id arithmetic: min-id per {2k, 2k+1} pair
    val out = AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpusAu((0L until 8L).toDF("doc_id")))
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == (0L until 8L).map(id => (id, id - id % 2, (1 - id % 2).toInt)))
  }

  test("FLAC roundtrip collapse (r17): a FLAC encoding of the planted samples hashes " +
    "identically to the PCM WAV of the same samples — both derived independently") {
    // 24 pairs: g spans multi-frame + partial-final-frame shapes (g%3),
    // mono/stereo (g%2), all four stereo decorrelations and subframe
    // modes (the (g+f+c)%4 rotations)
    val n = 48L
    val bytes = AudioDedup.syntheticDupAudioCorpusFlac((0L until n).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    (0 until (n / 2).toInt).foreach { g =>
      val wav = AudioDedup.sampleHash(bytes(g * 2L))
      val flac = AudioDedup.sampleHash(bytes(g * 2L + 1))
      assert(wav != null && flac != null, s"group $g: a spelling failed to decode")
      assert(wav.sample_hash == flac.sample_hash,
        s"group $g: FLAC spelling hashes apart from its PCM twin")
      assert(wav.n_frames == flac.n_frames && wav.channels == flac.channels)
      // triage agreement: flac_meta already recognized the container
      assert(graft.functions.FlacHeader.parse(bytes(g * 2L + 1)) != null)
    }
    // distinct groups stay distinct (the id frames ride the samples)
    assert(AudioDedup.sampleHash(bytes(1L)).sample_hash !=
      AudioDedup.sampleHash(bytes(3L)).sample_hash)
    // survivors are pure doc_id arithmetic: min-id per {2k, 2k+1} pair
    val out = AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpusFlac((0L until 8L).toDF("doc_id")))
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == (0L until 8L).map(id => (id, id - id % 2, (1 - id % 2).toInt)))
  }

  test("WAVE_FORMAT_EXTENSIBLE collapse (r17): the 0xFFFE spelling hashes identically " +
    "to its plain tag-1 twin at 16 AND 24 bits (24-bit pairs are cross-decoder)") {
    val n = 48L
    val bytes = AudioDedup.syntheticDupAudioCorpusWavX((0L until n).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    (0 until (n / 2).toInt).foreach { g =>
      val plain = AudioDedup.sampleHash(bytes(g * 2L))
      val wavx = AudioDedup.sampleHash(bytes(g * 2L + 1))
      assert(plain != null && wavx != null, s"group $g: a spelling failed to decode")
      assert(plain.sample_hash == wavx.sample_hash,
        s"group $g (bits=${if (g % 3 == 2) 24 else 16}): extensible hashes apart")
      assert(plain.n_frames == wavx.n_frames && plain.channels == wavx.channels)
      // triage recognized the extensible container and reports the REAL
      // precision (wValidBitsPerSample)
      val meta = graft.functions.AudioHeader.parse(bytes(g * 2L + 1))
      assert(meta != null && meta._4 == (if (g % 3 == 2) 24 else 16))
    }
    // distinct groups stay distinct
    assert(AudioDedup.sampleHash(bytes(1L)).sample_hash !=
      AudioDedup.sampleHash(bytes(3L)).sample_hash)
    // survivors are pure doc_id arithmetic
    val out = AudioDedup.dedupBySamples(
      AudioDedup.syntheticDupAudioCorpusWavX((0L until 8L).toDF("doc_id")))
      .select("doc_id", "survivor_id", "is_kept").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == (0L until 8L).map(id => (id, id - id % 2, (1 - id % 2).toInt)))
  }

  private def nearBytes(ids: Seq[Long]): Map[Long, Array[Byte]] =
    AudioDedup.syntheticNearDupAudioCorpus(ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap

  test("eHash64: the planted energy contour lands the groupGrid bits verbatim " +
    "(cross-modal: equals the image dHash of the same group); noise and container do not move it") {
    val bytes = nearBytes(0L until 8L)
    (0 to 1).foreach { g =>
      val hashes = (g * 4 until g * 4 + 4).map(i => AudioDedup.eHash64(bytes(i.toLong)))
      assert(hashes.forall(_.isDefined), s"group $g: a spelling refused the eHash")
      assert(hashes.map(_.get).distinct.size == 1,
        s"group $g spellings hash apart: ${hashes.map(h => f"${h.get}%016x")}")
      // same comparison topology, same planted code: the audio eHash IS
      // the image dHash of that group's painted grid
      val img = ImageDedup.paint(ImageDedup.groupGrid(g.toLong), cell = 4, perturb = false)
      assert(hashes.head.get == ImageDedup.dHash64(img),
        s"group $g: eHash and dHash diverge on the same planted code")
    }
    // sample hashes really split 2+2 inside each group (the work the
    // exact pass cannot do)
    val exactHashes = (0 until 4).map(i => AudioDedup.sampleHash(bytes(i.toLong)).sample_hash)
    assert(exactHashes.distinct.size == 2, s"expected clean/noisy split, got $exactHashes")
    // refusal floor: a clip under 72 frames has no energy contour
    val short = AudioDedup.syntheticDupAudioCorpus(Seq(0L).toDF("doc_id"))
      .collect().head.getAs[Array[Byte]]("payload") // 15-frame clip < 72
    assert(AudioDedup.eHash64(short).isEmpty)
    assert(AudioDedup.eHash64("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioDedup.eHash64(null).isEmpty)
  }

  test("audio nearDupPairs: noisy re-encodings pair at Hamming 0, distinct recordings never; " +
    "band join stays an equi-join; boundary refuses") {
    val docs = (0L until 12L).toDF("doc_id")
    val media = AudioDedup.syntheticNearDupAudioCorpus(docs)
    val pairs = AudioDedup.nearDupPairs(media, maxHamming = 2)
    // one collect serves both the data assert and the AQE-finalized plan
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (0 until 3).flatMap { g =>
      val ids = (g * 4 until g * 4 + 4).map(_.toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b, 0)
    }.toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"band candidates must equi-join on (band, bucket):\n$plan")
    intercept[IllegalArgumentException] {
      AudioDedup.nearDupPairs(media, maxHamming = 4)
    }
  }

  test("malformed headers never kill the task: inconsistent blockAlign and a " +
    "header-field fuzz all refuse-or-hash deterministically, never throw") {
    // The r15 ADVICE shape: a WAV claiming 12-bit stereo with blockAlign
    // 3 (< channels*bytesPer = 4). The JDK's WaveFileReader happens to
    // NORMALIZE the frame size (it decodes here as 2 clean 4-byte
    // frames), but the decodePcm frameSize guard + the catch-to-null
    // backstop make the contract SPI-independent: whatever a reader
    // reports, sampleHash/eHash64 return a value or null — a malformed
    // clip must never throw out of the hash and kill a crawl batch
    // (qe75's routedSignatures runs these per-row in mapPartitions).
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(channels: Int, bits: Int, blockAlign: Int, dataLen: Int): Array[Byte] = {
      val data = Array.fill[Byte](dataLen)(0x11)
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes); out.write(le32(36 + data.length)); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); out.write(le32(16))
      out.write(le16(1)); out.write(le16(channels))
      out.write(le32(8000)); out.write(le32(8000 * math.max(1, blockAlign)))
      out.write(le16(blockAlign)); out.write(le16(bits))
      out.write("data".getBytes); out.write(le32(data.length)); out.write(data)
      out.toByteArray
    }
    val advice = wav(channels = 2, bits = 12, blockAlign = 3, dataLen = 9)
    val s1 = AudioDedup.sampleHash(advice)
    val s2 = AudioDedup.sampleHash(advice)
    assert(s1 == s2, "hash of a normalized malformed clip must be deterministic")
    assert(AudioDedup.eHash64(advice) == AudioDedup.eHash64(advice))
    // header-field fuzz: degenerate channels/bits/blockAlign combos across
    // short payloads — totality is the assertion (result or null/None)
    for {
      ch <- Seq(0, 1, 2, 7, 255)
      bits <- Seq(0, 1, 8, 12, 16, 24, 33)
      ba <- Seq(0, 1, 2, 3, 4, 5, 17)
      n <- Seq(0, 1, 9, 64)
    } {
      val b = wav(ch, bits, ba, n)
      AudioDedup.sampleHash(b) // must not throw
      AudioDedup.eHash64(b)    // must not throw
    }
  }
}
