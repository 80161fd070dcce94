package graft.operators

import graft.PlanCapture.CheckpointOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio deduplication over DECODED samples (SURVEY §2.4, the audio leg of
  * the E1 exact-dedup family beside [[ImageDedup.dedupByPixels]]): the
  * same recording reaches a crawl as WAV (little-endian RIFF, 8-bit
  * stored UNSIGNED) and AIFF (big-endian, signed) — byte-level dedup sees
  * two unrelated blobs, sample-level dedup sees one recording.
  *
  * [[sampleHash]] decodes through javax.sound (the JDK's real PCM reader,
  * the [[Multimodal.JdkAudioCodec]] normalization discipline: per-frame
  * per-channel assembly honoring the container's endianness, then
  * sign-normalization so PCM_UNSIGNED and PCM_SIGNED storages of the same
  * wave hash identically) and md5s (channels, rate, normalized samples) —
  * rate and channel count are part of recording identity, bit DEPTH is
  * not hashed separately because different depths already store different
  * sample values. Undecodable or non-PCM payloads refuse with a null
  * hash and dedup as singletons (the engine-wide refuse-don't-guess +
  * never-merge-the-unread contract). */
object AudioDedup {

  case class AudioSig(doc_id: Long, channels: Int, sample_rate: Int,
                      n_frames: Long, sample_hash: String)

  /** md5 hex over (channels, rate, every normalized sample, frame-major
    * channel order); null when javax.sound cannot decode the bytes to
    * integer PCM. */
  def sampleHash(payload: Array[Byte]): AudioSig = {
    import javax.sound.sampled._
    if (payload == null) return null
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => return null }
    try {
      val f = ais.getFormat
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED &&
        f.getEncoding != AudioFormat.Encoding.PCM_UNSIGNED) return null
      val bytesPer = (f.getSampleSizeInBits + 7) / 8
      val frameSize = f.getFrameSize
      val raw = ais.readAllBytes()
      if (frameSize <= 0 || raw.length % frameSize != 0) return null
      val n = raw.length / frameSize
      val ch = f.getChannels
      val half = 1 << (f.getSampleSizeInBits - 1)
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(java.nio.ByteBuffer.allocate(8)
        .putInt(ch).putInt(f.getSampleRate.toInt).array())
      val word = java.nio.ByteBuffer.allocate(4)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < ch) {
          val off = i * frameSize + c * bytesPer
          var v = 0
          var j = 0
          while (j < bytesPer) {
            val b = raw(off + j) & 0xFF
            v = if (f.isBigEndian) (v << 8) | b else v | (b << (8 * j))
            j += 1
          }
          val s =
            if (f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED) v - half
            else if (v >= half) v - (half << 1) else v // sign-extend
          word.clear(); word.putInt(s)
          md.update(word.array())
          c += 1
        }
        i += 1
      }
      AudioSig(-1L, ch, f.getSampleRate.toInt, n,
        md.digest().map("%02x".format(_)).mkString)
    } catch { case _: Exception => null }
    finally ais.close()
  }

  /** Decode stage: one mapPartitions pass to per-clip signatures. */
  def audioSignatures(media: DataFrame): Dataset[AudioSig] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val sig = sampleHash(payload)
          if (sig == null) AudioSig(id, -1, -1, -1L, null)
          else sig.copy(doc_id = id)
        }
      }
  }

  /** Exact sample dedup: min-id survivor per sample hash; undecodable
    * rows stay singletons. Checkpointed signatures feed both sides of
    * the survivor join — each clip decodes once per action. */
  def dedupBySamples(media: DataFrame): DataFrame = {
    val sigs = audioSignatures(media).toDF()
      .auditedCheckpoint()
      .withColumn("__key",
        coalesce(col("sample_hash"), concat(lit("doc:"), col("doc_id"))))
    val survivors = sigs.groupBy(col("__key"))
      .agg(min(col("doc_id")).as("survivor_id"))
    sigs.join(survivors, Seq("__key"), "left")
      .withColumn("is_kept", (col("doc_id") === col("survivor_id")).cast("int"))
      .drop("__key")
  }

  // ---- planted corpus --------------------------------------------------

  /** 80-bit extended-float encodings of the planted sample rates (the
    * AIFF COMM field; same constants [[Multimodal.audioPayloadHex]]
    * plants, kept in one place per rate). */
  private val Ext80: Map[Int, Array[Byte]] = Map(
    8000 -> "400BFA00000000000000", 16000 -> "400CFA00000000000000",
    22050 -> "400DAC44000000000000", 44100 -> "400EAC44000000000000")
    .map { case (r, hx) =>
      r -> hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }

  /** Deterministic signed sample value for (group, frame, channel): a
    * planted waveform in [-100, 100], inside every depth's range. */
  private def sampleOf(g: Long, i: Int, c: Int): Int =
    (((g * 31 + i * 7 + c * 13) % 201) - 100).toInt

  private def writeWav(g: Long, ch: Int, rate: Int, bits: Int, frames: Int,
                       junk: Boolean): Array[Byte] = {
    val bytesPer = bits / 8
    val dataSize = frames * ch * bytesPer
    val junkLen = if (junk) 12 else 0
    val bb = java.nio.ByteBuffer.allocate(12 + junkLen + 24 + 8 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(4 + junkLen + 24 + 8 + dataSize)
      .put("WAVE".getBytes)
    if (junk) bb.put("JUNK".getBytes).putInt(4).putInt(0xDEADBEEF)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(ch.toShort)
      .putInt(rate).putInt(rate * ch * bytesPer)
      .putShort((ch * bytesPer).toShort).putShort(bits.toShort)
    bb.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < ch) {
        val v = sampleOf(g, i, c)
        if (bits == 8) bb.put((v + 128).toByte) // WAV 8-bit stores UNSIGNED
        else bb.putShort(v.toShort)
        c += 1
      }
      i += 1
    }
    bb.array()
  }

  private def writeAiff(g: Long, ch: Int, rate: Int, bits: Int, frames: Int,
                        anno: Boolean): Array[Byte] = {
    val bytesPer = bits / 8
    val dataSize = frames * ch * bytesPer
    val annoLen = if (anno) 12 else 0
    val bb = java.nio.ByteBuffer.allocate(12 + annoLen + 26 + 16 + dataSize)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("FORM".getBytes).putInt(4 + annoLen + 26 + 16 + dataSize)
      .put("AIFF".getBytes)
    if (anno) bb.put("ANNO".getBytes).putInt(4).put("test".getBytes)
    bb.put("COMM".getBytes).putInt(18).putShort(ch.toShort).putInt(frames)
      .putShort(bits.toShort).put(Ext80(rate))
    bb.put("SSND".getBytes).putInt(8 + dataSize).putInt(0).putInt(0)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < ch) {
        val v = sampleOf(g, i, c)
        if (bits == 8) bb.put(v.toByte) // AIFF 8-bit stores SIGNED
        else bb.putShort(v.toShort)
        c += 1
      }
      i += 1
    }
    bb.array()
  }

  /** Exact-dup corpus: four docs per group (g = doc_id / 4) carry the
    * SAME recording — same (channels, rate, bits, frames, sample values)
    * — as WAV, AIFF, WAV-with-JUNK-chunk, AIFF-with-ANNO-chunk, so the
    * oracle's survivor/is_kept columns are pure doc_id arithmetic while
    * the engine exercises both endiannesses, both 8-bit sign storages,
    * and the chunk walk. Params rotate per group: channels 1–2, 8/16-bit
    * depth, the four planted rates, 5–44 frames. */
  def syntheticDupAudioCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val g = id / 4
          val ch = (g % 2 + 1).toInt
          val bits = if (g % 3 == 0) 8 else 16
          val rate = Array(8000, 16000, 22050, 44100)((g % 4).toInt)
          val frames = (g % 40 + 5).toInt
          val bytes = (id % 4).toInt match {
            case 0 => writeWav(g, ch, rate, bits, frames, junk = false)
            case 1 => writeAiff(g, ch, rate, bits, frames, anno = false)
            case 2 => writeWav(g, ch, rate, bits, frames, junk = true)
            case _ => writeAiff(g, ch, rate, bits, frames, anno = true)
          }
          (id, bytes, if (id % 2 == 0) "audio/wav" else "audio/aiff")
        }
      }.toDF("doc_id", "payload", "mime")
  }
}
