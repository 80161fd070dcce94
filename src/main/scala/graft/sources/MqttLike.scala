package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Path, Paths}
import java.util.{Collections => JCollections}
import scala.jdk.CollectionConverters._

/** A full DataSourceV2 micro-batch source with the shape of the reference's
  * MQTT subscription (SURVEY §2.1 S6; ref `consumer.cpp:65-82,111-145`):
  * each message is one (topic, payload, arrival ts) row.
  *
  * TRANSPORT IS SUBSTITUTED: this container has no broker, so messages are
  * a spool directory — one file per message, monotonically named
  * `<seq>.msg` (what a tiny bridge process subscribing at QoS 1 would
  * write). Everything Spark-facing is real: offset tracking is the message
  * sequence number, so restarts resume exactly where the checkpoint says,
  * and each micro-batch is a contiguous, replayable seq range — the same
  * delivery contract the reference gets from MQTT QoS 1 + broker session.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-mqtt")
  *     .option("spoolDir", dir).option("topic", "sensors/dd").load()
  * }}}
  */
class MqttLikeProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mqtt"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MqttLike.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new MqttLikeTable(properties.asScala.toMap)
}

object MqttLike {
  /** `writer` is the publishing lane: "" for the classic single-session
    * topic, `w-<partition>` for partitioned high-rate sinks. `msg_seq` is
    * dense per (topic, writer). */
  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("msg_seq", LongType, nullable = false),
    StructField("writer", StringType, nullable = false)))

  /** Per-writer lanes present under a topic dir: always the root lane "",
    * plus any `w-<id>` subdirectories a partitioned sink created. */
  def listSubstreams(topicDir: Path): Seq[String] =
    if (!Files.isDirectory(topicDir)) Seq("")
    else {
      val s = Files.list(topicDir)
      val subs = try s.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("w-"))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
      "" +: subs
    }

  /** Publish one message into a spool dir (the bridge/producer side).
    * Single-writer per topic is the normal contract (one broker session —
    * `ModuleRegistry.start` coalesces the sink to one task), but concurrent
    * publishers are safe, and so are publisher CRASHES at any point:
    *
    *  1. payload is written to a unique dot-hidden tmp file;
    *  2. the seq slot is claimed by hard-LINKING the tmp as `.<seq>.claim` —
    *     link creation is O_EXCL-atomic (a collision retries the next seq)
    *     and the claim carries the FULL payload from the instant it exists,
    *     never content-less;
    *  3. the visible `<seq>.msg` is hard-linked FROM the claim — also
    *     atomic-exclusive. The claim is never deleted (dot-hidden, readers
    *     ignore it; it shares the msg's inode so costs no data): it is the
    *     permanent tombstone that stops any later writer re-claiming a slot
    *     whose msg already landed.
    *
    * A crash between 2 and 3 leaves a contentful claim with no msg —
    * [[repair]] (run by the reader's every offset poll, and by a publisher
    * on its first claim collision) completes step 3 idempotently, so a dead
    * publisher can never wedge the topic's dense prefix. */
  def publish(spoolDir: String, topic: String, payload: String): Long =
    publish(spoolDir, topic, payload, substream = "")

  /** `substream` names a per-writer lane under the topic (`w-<partition>`,
    * see [[Sinks.MqttLikePublishWriter]] partitioned mode): each lane has
    * its own dense seq space and its own claims, so N parallel sink tasks
    * publish with zero contention — the high-rate alternative to the
    * single-broker-session `coalesce(1)` model. The reader merges lanes
    * with a per-lane offset vector. */
  def publish(spoolDir: String, topic: String, payload: String, substream: String): Long =
    publishFrom(spoolDir, topic, payload, substream,
      nextSeq(laneDirOf(spoolDir, topic, substream)))

  /** Publish starting the claim walk at a caller-cached seq hint, skipping
    * the per-message directory listing `publish` pays — the sink hot path:
    * a ForeachWriter lists once in open() ([[nextSeqIn]]) and feeds each
    * publish's returned seq + 1 back in. A stale hint only costs claim
    * collisions, which the resync path below already absorbs. */
  def publishFrom(spoolDir: String, topic: String, payload: String,
                  substream: String, startSeq: Long): Long = {
    val dir = laneDirOf(spoolDir, topic, substream)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".pub-${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, payload)
    var seq = math.max(0L, startSeq)
    // A hint AHEAD of the claim space would claim a future slot with no
    // collision (so the resync path never runs), leaving a permanent hole
    // below it that stalls densePrefix forever. Claims are dense under every
    // valid history (publish walks up from nextSeq; claims are never
    // deleted), so "predecessor claim exists" is an O(1) validity probe; a
    // missing predecessor means the hint is ahead — treat it like a
    // collision and resync before claiming.
    if (seq > 0 && !Files.exists(dir.resolve(s".${seq - 1}.claim"))) {
      repair(dir)
      seq = nextSeq(dir)
    }
    var claimed = false
    // repair lazily: an eager repair() here is a full directory listing per
    // message (O(n), O(n²) over a topic's life). The reader already repairs
    // every lane on each offset poll; a publisher only needs it when a claim
    // collision hints at a dead writer's un-promoted claim wedging the seq.
    var repaired = false
    while (!claimed) {
      try {
        Files.createLink(dir.resolve(s".$seq.claim"), tmp)
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          if (!repaired) {
            repaired = true
            repair(dir)
            seq = math.max(seq + 1, nextSeq(dir))
          } else seq += 1
      }
    }
    promote(dir, seq)
    Files.deleteIfExists(tmp)
    seq
  }

  /** Step 3: expose a claimed slot as `<seq>.msg`. Racing a repairer is
    * fine — exactly one link wins; the loser's EEXIST means "already
    * published". */
  private def promote(dir: Path, seq: Long): Unit =
    try Files.createLink(dir.resolve(s"$seq.msg"), dir.resolve(s".$seq.claim"))
    catch {
      case _: java.nio.file.FileAlreadyExistsException => () // repaired by another
      case _: java.nio.file.NoSuchFileException => ()        // defensive; claims persist
    }

  /** Complete any claim whose msg never landed (publisher died between claim
    * and publish) and age out orphaned tmp files. Idempotent, safe to race
    * with live publishers: claims are contentful by construction, so
    * promoting an in-flight claim merely publishes it a moment early. */
  def repair(dir: Path): Unit = { repairFrom(dir, listNames(dir)); () }

  private def listNames(dir: Path): Vector[String] =
    if (!Files.isDirectory(dir)) Vector.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector finally s.close()
    }

  /** Parse a `<digits><suffix>` stem to its seq, or None for a FOREIGN
    * file: the spool and poll caches are externally-writable interfaces
    * (a bridge process, an operator's stray `readme.msg`), and one
    * non-numeric stem must not NumberFormatException every subsequent
    * offset poll into a permanently dead stream — foreign files are
    * ignored, never parsed. Stems longer than 18 digits (Long overflow)
    * are foreign too. */
  private[sources] def numberedStem(name: String, suffix: String): Option[Long] =
    if (!name.endsWith(suffix)) None
    else {
      val stem = name.dropRight(suffix.length)
      if (stem.nonEmpty && stem.length <= 18 && stem.forall(_.isDigit))
        Some(stem.toLong)
      else None
    }

  /** Repair from an already-taken listing; returns the visible msg seq set
    * INCLUDING newly promoted claims, so callers that also need the dense
    * prefix pay one directory listing, not two. */
  private def repairFrom(dir: Path, names: Vector[String]): Set[Long] = {
    val msgs = names.flatMap(numberedStem(_, ".msg")).toSet
    val promoted = names.filter(_.startsWith("."))
      .flatMap(n => numberedStem(n.stripPrefix("."), ".claim"))
      .filterNot(msgs)
      .map { n => promote(dir, n); n }
    // tmp files are pre-claim scratch: an orphan older than the cutoff was
    // a publisher that died before claiming — its message was never made
    // durable, so deletion is the correct QoS-1 outcome (sender retries).
    ageTmpNames(dir, names, ".pub-", ".tmp")
    msgs ++ promoted
  }

  /** The reader's per-trigger lane poll: repair wedges AND compute the
    * dense prefix from the SAME listing (two full listings per lane per
    * trigger otherwise — O(spool) driver work doubled for nothing). */
  def repairAndDensePrefix(dir: Path): Long = {
    val visible = repairFrom(dir, listNames(dir))
    Iterator.from(0).takeWhile(i => visible.contains(i.toLong)).size.toLong
  }

  private val TmpOrphanMs = 15L * 60 * 1000

  /** Age out orphaned scratch files (`<prefix>*<suffix>` older than
    * [[TmpOrphanMs]]) from an already-taken listing — ONE cutoff shared by
    * the spool repair and the HTTP poll cache, so the two connectors'
    * janitors cannot silently drift apart. */
  private[sources] def ageTmpNames(dir: Path, names: Iterable[String],
                                   prefix: String, suffix: String): Unit = {
    val cutoff = System.currentTimeMillis() - TmpOrphanMs
    names.filter(n => n.startsWith(prefix) && n.endsWith(suffix)).foreach { n =>
      val p = dir.resolve(n)
      try if (Files.getLastModifiedTime(p).toMillis < cutoff) Files.deleteIfExists(p)
      catch { case _: java.io.IOException => () }
    }
  }

  /** [[ageTmpNames]] with its own listing, for callers without one. */
  private[sources] def ageTmpsIn(dir: Path, prefix: String, suffix: String): Unit =
    if (Files.isDirectory(dir)) ageTmpNames(dir, listNames(dir), prefix, suffix)

  def sanitize(topic: String): String = topic.replaceAll("[^A-Za-z0-9._-]", "_")

  def listSeqs(dir: Path): Seq[Long] = listNumbered(dir, ".msg")

  /** Sorted seqs of `<digits><suffix>` files in a directory, foreign
    * files ignored ([[numberedStem]]) — ONE listing helper for the spool
    * (.msg) and the HTTP poll cache (.poll), so a parsing fix cannot
    * reach one connector and miss the other. */
  private[sources] def listNumbered(dir: Path, suffix: String): Seq[Long] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .flatMap(numberedStem(_, suffix)).toSeq.sorted
      finally s.close()
    }

  /** Length of the dense prefix 0..n-1 of visible messages. Readers scan a
    * contiguous seq range, so the stream's latest offset only advances
    * through gap-free territory — a straggling concurrent publisher (claimed
    * seq not yet moved into place) holds the offset back rather than making
    * a reader hit a missing file. */
  def densePrefix(dir: Path): Long =
    listSeqs(dir).zipWithIndex.takeWhile { case (s, i) => s == i }.size.toLong

  private def nextSeq(dir: Path): Long = listSeqs(dir).lastOption.fold(0L)(_ + 1)

  private def laneDirOf(spoolDir: String, topic: String, substream: String): Path = {
    val base = Paths.get(spoolDir, sanitize(topic))
    if (substream.isEmpty) base else base.resolve(sanitize(substream))
  }

  /** The next free seq in a lane — the one listing a cached-seq publisher
    * ([[publishFrom]]) pays, at open() instead of per message. */
  def nextSeqIn(spoolDir: String, topic: String, substream: String): Long =
    nextSeq(laneDirOf(spoolDir, topic, substream))

  /** Record the publisher's QoS as lane metadata (`.qos`, dot-hidden so
    * readers ignore it) — K1/K2's QoS-1-vs-2 distinction made observable.
    * First writer wins; the transport substitute delivers exactly-once
    * either way (dense offsets + checkpoints). */
  def recordQos(spoolDir: String, topic: String, substream: String, qos: Int): Unit = {
    val dir = laneDirOf(spoolDir, topic, substream)
    Files.createDirectories(dir)
    val f = dir.resolve(".qos")
    if (!Files.exists(f)) {
      try Files.writeString(f, qos.toString, java.nio.file.StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
  }
}

class MqttLikeTable(rawProps: Map[String, String]) extends Table with SupportsRead {
  private val props = rawProps.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  private val spoolDir = props.getOrElse("spooldir",
    throw new IllegalArgumentException("graft-mqtt requires option spoolDir"))
  private val topic = props.getOrElse("topic",
    throw new IllegalArgumentException("graft-mqtt requires option topic"))

  override def name(): String = s"graft-mqtt:$topic"
  override def schema(): StructType = MqttLike.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    JCollections.unmodifiableSet(new java.util.HashSet(java.util.Arrays.asList(
      TableCapability.MICRO_BATCH_READ)))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = MqttLike.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MqttLikeMicroBatchStream(spoolDir, topic)
    }
}

/** Offset = per-lane consumed counts (each lane's seq is dense from 0).
  * JSON is a sorted `{"lane":count}` object; a bare integer (the pre-lane
  * single-writer format) deserializes as the root lane, so existing
  * checkpoints keep resuming. */
case class SeqOffset(counts: Map[String, Long]) extends Offset {
  /** Root-lane count — the whole offset for single-lane sources
    * (graft-http, classic single-writer topics). */
  def root: Long = counts.getOrElse("", 0L)
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + SeqOffset.enc(k) + "\":" + v }
      .mkString("{", ",", "}")
}

object SeqOffset {
  def apply(n: Long): SeqOffset = SeqOffset(Map("" -> n))

  /** Lane names are DIRECTORY names an external bridge may create, and
    * the offset serializer splits naively on `,` and `:` — so delimiter,
    * quote, and whitespace characters are percent-encoded in the JSON
    * key. A lane like `w-host:3` then round-trips through the checkpoint
    * instead of corrupting it; the library's own `w-<n>` lanes (and any
    * [[MqttLike.sanitize]]d name) contain no such characters, so existing
    * checkpoints parse unchanged. */
  private[sources] def enc(k: String): String =
    k.flatMap { c =>
      if (c == '%' || c == '"' || c == '\\' || c == ':' || c == ',' ||
          c == '{' || c == '}' || c.isWhitespace)
        // encode the char's UTF-8 BYTES, each as exactly two hex digits:
        // a code point above 0xFF (e.g. U+2028, which isWhitespace
        // matches) formatted as "%%${c.toInt}%02X" would emit MORE than
        // two digits while dec consumes exactly two — corrupting the lane
        // name on checkpoint round trip
        String.valueOf(c).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => f"%%${b & 0xFF}%02X").mkString
      else c.toString
    }

  private[sources] def dec(k: String): String = {
    val sb = new StringBuilder
    // consecutive %XX escapes are a UTF-8 byte run (one multi-byte char
    // encodes as several escapes) — collect and decode the run as a unit
    val run = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (run.size > 0) {
      sb.append(new String(run.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      run.reset()
    }
    var i = 0
    def hex(c: Char) = Character.digit(c, 16) >= 0
    while (i < k.length) {
      // a '%' not followed by two hex digits stays literal: legacy
      // checkpoints written before encoding existed must parse unchanged
      if (k(i) == '%' && i + 3 <= k.length && hex(k(i + 1)) && hex(k(i + 2))) {
        run.write(Integer.parseInt(k.substring(i + 1, i + 3), 16))
        i += 3
      } else { flush(); sb += k(i); i += 1 }
    }
    flush()
    sb.toString
  }

  def parse(json: String): SeqOffset = {
    val t = json.trim
    if (!t.startsWith("{")) SeqOffset(t.toLong)
    else {
      val body = t.stripPrefix("{").stripSuffix("}").trim
      if (body.isEmpty) SeqOffset(Map.empty[String, Long])
      else SeqOffset(body.split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        dec(k.trim.stripPrefix("\"").stripSuffix("\"")) -> v.trim.toLong
      }.toMap)
    }
  }
}

class MqttLikeMicroBatchStream(spoolDir: String, topic: String) extends MicroBatchStream {
  private val dir = Paths.get(spoolDir, MqttLike.sanitize(topic))
  private def laneDir(lane: String): Path = if (lane.isEmpty) dir else dir.resolve(lane)

  override def initialOffset(): Offset = SeqOffset(Map.empty[String, Long])
  override def deserializeOffset(json: String): Offset = SeqOffset.parse(json)
  // repair first: a publisher that died mid-publish must not wedge a lane's
  // dense prefix forever — the claim protocol makes completion safe from
  // the reader side (see MqttLike.publish docs)
  override def latestOffset(): Offset = {
    SeqOffset(MqttLike.listSubstreams(dir).map { lane =>
      lane -> MqttLike.repairAndDensePrefix(laneDir(lane))
    }.filter(_._2 > 0).toMap)
  }
  override def commit(end: Offset): Unit = () // spool retained for replay

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].counts
    val e = end.asInstanceOf[SeqOffset].counts
    e.toSeq.sortBy(_._1).flatMap { case (lane, hi) =>
      val base = s.getOrElse(lane, 0L)
      if (hi <= base) Seq.empty
      else {
        // split each lane's contiguous seq range so a backlog reads in
        // parallel
        val targetPerPartition = 1000L
        val nParts = math.min(32L, math.max(1L, (hi - base + targetPerPartition - 1) / targetPerPartition))
        val step = (hi - base + nParts - 1) / nParts
        (base until hi by step).map(lo =>
          MqttRangePartition(laneDir(lane).toString, topic, lane, lo,
            math.min(hi, lo + step)): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[MqttRangePartition]
      new PartitionReader[InternalRow] {
        private var seq = p.fromSeq - 1
        override def next(): Boolean = { seq += 1; seq < p.untilSeq }
        override def get(): InternalRow = {
          val payload = Files.readString(Paths.get(p.dir, s"$seq.msg"))
          InternalRow(UTF8String.fromString(p.topic),
            UTF8String.fromString(payload), seq, UTF8String.fromString(p.lane))
        }
        override def close(): Unit = ()
      }
    }
  }

  override def stop(): Unit = ()
}

case class MqttRangePartition(dir: String, topic: String, lane: String,
                              fromSeq: Long, untilSeq: Long)
  extends InputPartition
