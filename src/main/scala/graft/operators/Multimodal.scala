package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.4 E5): image/audio/video as
  * opaque `binary` payloads with a typed metadata struct, plus per-partition
  * decode / feature-extract / frame-sample stages.
  *
  * The decode step is REAL for image containers: width/height/type parse
  * from PNG/JPEG/GIF header bytes via [[graft.functions.ImageHeader]] (the
  * formats' published layouts — no codec library needed for container
  * metadata). PIXEL decoding and feature extraction remain STUBBED with a
  * deterministic fake ([[FakeCodec]]) — the container has no image/audio
  * libraries. Swap [[FakeCodec]] for a real decoder (JNI/FFI) without
  * touching the dataflow.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, nFrames: Int)
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class DecodedRow(doc_id: Long, mime: String, byteLen: Long,
                        width: Int, height: Int, nFrames: Int, feature: Array[Float])

  /** ==== STUB ==== deterministic fake codec standing in for libjpeg/ffmpeg.
    * Derives stable pseudo-metadata and a tiny pseudo-feature vector from
    * payload bytes so tests are reproducible. */
  object FakeCodec {
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      // long arithmetic: n * 7 overflows Int negative past ~307 MB payloads
      MediaMeta("image/fake", 16 + n % 640, 16 + (n.toLong * 7 % 480).toInt, 1 + n % 30)
    }
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) { out(i % dim) += (payload(i) & 0xFF) / 255.0f; i += 1 }
      out
    }
    /** ==== STUB ==== deterministic fake resize: byte-stride subsample to a
      * target "pixel" budget (real impl: libvips/Pillow equivalent). */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h / 64)
      val stride = math.max(1, payload.length / target)
      payload.grouped(stride).map(_.head).toArray
    }
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val len = math.max(1, payload.length / math.max(1, n))
      (0 until n).map(i => payload.slice(i * len, math.min(payload.length, (i + 1) * len)))
    }
  }

  /** Attach a binary payload column (here faked from text bytes — the real
    * pipeline reads `binaryFile` sources: `spark.read.format("binaryFile")`). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      lit("text/plain").as("mime"))

  /** Deterministic IMAGE corpus: per doc, a payload whose bytes are a real
    * PNG / JPEG / GIF container header (spec-valid through the dimension
    * fields — the JPEG even carries the APP0/JFIF segment the parser must
    * scan past) with planted width = doc_id % 640 + 1 and height =
    * doc_id % 480 + 1. Because the planted dims are plain arithmetic over
    * doc_id, a DuckDB oracle can state the expected decode output without
    * parsing bytes — so the REAL parser ([[graft.functions.ImageHeader]])
    * is driver-certified end-to-end: any construction-offset or parse
    * error hash-mismatches. Codegen projection, shuffle-free. */
  def syntheticImageCorpus(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val w = id % 640 + 1
    val h = id % 480 + 1
    val w4 = lpad(hex(w), 4, "0"); val h4 = lpad(hex(h), 4, "0")
    val w8 = lpad(hex(w), 8, "0"); val h8 = lpad(hex(h), 8, "0")
    def le(v: Column) = concat(
      lpad(hex(v.bitwiseAND(255)), 2, "0"), lpad(hex(shiftright(v, 8)), 2, "0"))
    // signature + IHDR(len 13) + dims + bit depth 8, RGBA + placeholder CRC
    val png = concat(lit("89504E470D0A1A0A0000000D49484452"), w8, h8,
      lit("0806000000DEADBEEF"))
    // SOI + APP0/JFIF(16 bytes) + SOF0(len 17: precision 8, H, W, 3 comps) + EOI
    val jpg = concat(lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
      h4, w4, lit("03011100021101031101FFD9"))
    // "GIF89a" + logical-screen W/H (little-endian) + GCT flags/bg/aspect
    val gif = concat(lit("474946383961"), le(w), le(h), lit("F70000"))
    docs.select(id.as("doc_id"),
      unhex(when(id % 3 === 0, png).when(id % 3 === 1, jpg).otherwise(gif))
        .as("payload"),
      lit("application/octet-stream").as("mime"))
  }

  /** Decode stage: mapPartitions so a real codec amortizes per-partition
    * init (decoder contexts, GPU handles). Repartition first so decode
    * parallelism matches cluster width, not input-file layout. */
  def decodeAll(media: DataFrame, partitions: Int = 0): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = (if (partitions > 0) media.repartition(partitions, col("doc_id")) else media)
      .select(col("doc_id"), col("payload"), col("mime")).as[MediaRow]
    src.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { r =>
        // REAL container-header parse first (PNG/JPEG/GIF dims + detected
        // mime); the deterministic fake only backstops payloads that are
        // not recognizable images, keeping their declared mime
        val real = graft.functions.ImageHeader.parse(r.payload)
        if (real != null)
          DecodedRow(r.doc_id, real._1, r.payload.length.toLong,
            real._2, real._3, 1, FakeCodec.features(r.payload))
        else {
          val m = FakeCodec.decode(r.payload)
          DecodedRow(r.doc_id, r.mime, r.payload.length.toLong,
            m.width, m.height, m.nFrames, FakeCodec.features(r.payload))
        }
      }
    }
  }

  /** Resize stage: per-partition like decode; emits resized payloads with
    * recorded target dims. */
  def resizeAll(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("mime")).as[MediaRow]
      .mapPartitions(_.map(r => MediaRow(r.doc_id, FakeCodec.resize(r.payload, w, h), r.mime)))
      .toDF()
      .withColumn("width", lit(w)).withColumn("height", lit(h))
  }

  /** Frame-sampling stage: one output row per sampled frame. */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("mime")).as[MediaRow]
      .flatMap { r =>
        FakeCodec.sampleFrames(r.payload, nFrames).zipWithIndex.map {
          case (frame, i) => (r.doc_id, i, frame)
        }
      }.toDF("doc_id", "frame_idx", "frame")
  }
}
