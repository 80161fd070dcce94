package graft.functions

import javax.sound.sampled.{AudioFormat, AudioInputStream}
import javax.sound.sampled.spi.{AudioFileReader, FormatConversionProvider}

/** javax.sound SPI access with the provider lookup hoisted out of the
  * per-clip hot path (r18 optimization round, guide §1.2 "per-task work").
  *
  * `AudioSystem.getAudioInputStream` resolves its reader/converter
  * providers through `JDK13Services.getProviders`, a SYNCHRONIZED static
  * the JDK re-enters on EVERY call — measured on the audio-dedup decode
  * stage as a lock convoy: 5000 tiny clips decoded in 0.64 s on ONE core
  * but 1.21 s wall on 32 (negative scaling; OPTIMIZATION_r18.md). The
  * providers themselves are stateless parser singletons (AudioSystem
  * hands the same cached instances to every thread), so resolving them
  * ONCE per JVM via the public `ServiceLoader` SPI and iterating directly
  * is behavior-identical — same reader objects, same decode, same
  * refusal semantics — without the global lock per clip.
  *
  * Reader order is irrelevant for correctness here: the JDK's WAV/AIFF/AU
  * readers accept disjoint magic bytes, and each refusal leaves the
  * caller-supplied stream untouched because every attempt gets a FRESH
  * ByteArrayInputStream (stricter than AudioSystem's shared mark/reset). */
object AudioSpi {

  private lazy val readers: Array[AudioFileReader] = {
    val it = java.util.ServiceLoader.load(classOf[AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[AudioFileReader]
    while (it.hasNext) buf += it.next()
    buf.toArray
  }

  private lazy val converters: Array[FormatConversionProvider] = {
    val it = java.util.ServiceLoader.load(classOf[FormatConversionProvider]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[FormatConversionProvider]
    while (it.hasNext) buf += it.next()
    buf.toArray
  }

  /** First reader that accepts the bytes, as an open stream — the
    * `AudioSystem.getAudioInputStream(InputStream)` contract minus the
    * synchronized provider walk; null when every reader refuses (the
    * caller's refuse-don't-guess branch, previously the
    * UnsupportedAudioFileException path). */
  def open(payload: Array[Byte]): AudioInputStream = {
    var i = 0
    while (i < readers.length) {
      try return readers(i).getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => () }
      i += 1
    }
    null
  }

  /** `AudioSystem.getAudioInputStream(targetEncoding, ais)` minus the
    * synchronized provider walk: the source stream when it already
    * carries the encoding, the first supporting converter's stream
    * otherwise, null when no converter supports it (the caller's refuse
    * branch). */
  def convert(target: AudioFormat.Encoding, ais: AudioInputStream): AudioInputStream = {
    if (ais.getFormat.getEncoding == target) return ais
    var i = 0
    while (i < converters.length) {
      val c = converters(i)
      if (c.isConversionSupported(target, ais.getFormat))
        try return c.getAudioInputStream(target, ais)
        catch { case _: Exception => () }
      i += 1
    }
    null
  }
}
