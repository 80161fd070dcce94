package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}
import scala.jdk.CollectionConverters._

/** Real MQTT 3.1.1 wire transport (SURVEY §2.1 S6/K1-K2; the last
  * reference capability that was transport-substituted — the reference
  * publishes over a live mosquitto connection, ref
  * `src/modules/libs/mqtt.c:49-97`, `producer.c:152-161`).
  *
  * Everything here is the PUBLIC OASIS MQTT 3.1.1 packet layout: fixed
  * header (type nibble + flags, 1-4 byte base-128 varint remaining
  * length), length-prefixed UTF-8 strings, big-endian u16 packet ids.
  * Scope is the subset the reference uses — CONNECT/CONNACK,
  * PUBLISH/PUBACK at QoS 0/1, SUBSCRIBE/SUBACK, PINGREQ/PINGRESP,
  * DISCONNECT. QoS 2's four-way handshake is not implemented (the spool
  * layer's dense offsets + checkpoints already provide the effective
  * exactly-once the reference buys with QoS 2); a QoS 2 publish request
  * REFUSES loudly ([[MqttWireClient.publish]] and the wire-mode sink
  * both require qos <= 1), never silently downgrades.
  *
  * The wire REPLACES the spool's ingress/egress edge, not its contract:
  * [[MqttSpoolBridge]] subscribes at QoS 1 and writes each inbound
  * message into the [[MqttLike]] spool (claim-link protocol, dense seqs)
  * BEFORE acking, so the graft-mqtt DataSourceV2 source, its offset
  * vector, and its checkpoint-resume semantics are untouched — a broker
  * redelivery after a bridge crash lands as a duplicate row, which is
  * QoS 1's at-least-once contract, exactly what the reference gets.
  * [[Sinks.MqttLikePublishWriter]] selects the wire by URI scheme: a
  * `mqtt://host:port` target publishes over a socket; a plain path keeps
  * the spool. TLS is a socket-factory seam (the reference's mosquitto is
  * TLS): this container has no CA material, so the client takes a plain
  * TCP socket and documents where an SSLSocketFactory plugs in.
  */
object MqttCodec {

  val Connect = 1; val Connack = 2; val Publish = 3; val Puback = 4
  val Subscribe = 8; val Suback = 9; val Pingreq = 12; val Pingresp = 13
  val Disconnect = 14

  /** One decoded control packet: type nibble, flag nibble, body bytes. */
  final case class Packet(ptype: Int, flags: Int, body: Array[Byte])

  /** Base-128 varint remaining length, 1-4 bytes (spec §2.2.3). */
  def writeRemainingLength(out: DataOutputStream, n0: Int): Unit = {
    require(n0 >= 0 && n0 <= 268435455, s"remaining length out of range: $n0")
    var n = n0
    var more = true
    while (more) {
      val digit = n % 128
      n /= 128
      more = n > 0
      out.writeByte(if (more) digit | 0x80 else digit)
    }
  }

  def readRemainingLength(in: DataInputStream): Int = {
    var mult = 1; var value = 0; var i = 0
    var cont = true
    while (cont) {
      if (i >= 4) throw new IOException("malformed remaining length (>4 bytes)")
      val b = in.readUnsignedByte()
      value += (b & 0x7F) * mult
      mult *= 128
      cont = (b & 0x80) != 0
      i += 1
    }
    value
  }

  def writePacket(out: DataOutputStream, ptype: Int, flags: Int,
                  body: Array[Byte]): Unit = out.synchronized {
    out.writeByte((ptype << 4) | (flags & 0x0F))
    writeRemainingLength(out, body.length)
    out.write(body)
    out.flush()
  }

  /** Blocking read of one packet; throws EOFException on orderly close. */
  def readPacket(in: DataInputStream): Packet = {
    val h = in.readUnsignedByte()
    val len = readRemainingLength(in)
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(h >>> 4, h & 0x0F, body)
  }

  /** Length-prefixed UTF-8 string (spec §1.5.3). */
  def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length <= 0xFFFF, s"MQTT string too long: ${b.length}")
    Array[Byte]((b.length >>> 8).toByte, (b.length & 0xFF).toByte) ++ b
  }

  def u16(n: Int): Array[Byte] =
    Array[Byte]((n >>> 8).toByte, (n & 0xFF).toByte)

  def connectBody(clientId: String, cleanSession: Boolean,
                  keepAliveSecs: Int,
                  credentials: Option[(String, String)] = None): Array[Byte] = {
    // flags: bit7 username present, bit6 password present, bit1 clean
    // session (spec §3.1.2.3-9); payload order clientId, username,
    // password (§3.1.3)
    val flags = (if (cleanSession) 0x02 else 0x00) |
      credentials.fold(0)(_ => 0x80 | 0x40)
    utf8("MQTT") ++ Array[Byte](4, flags.toByte) ++ // protocol level 3.1.1
      u16(keepAliveSecs) ++ utf8(clientId) ++
      credentials.fold(Array.empty[Byte]) { case (u, p) => utf8(u) ++ utf8(p) }
  }

  /** Parse a `mqtt://[user:pass@]host:port` target into
    * (host, port, credentials) — ONE parser for the sink writer and the
    * ModuleRegistry bridge so their accepted syntax cannot drift. Splits
    * userinfo at the LAST '@' and the port at the last ':' (so a
    * bracketless IPv6 literal, whose colons sit inside the host, is
    * refused descriptively instead of reaching the resolver mangled). */
  def parseEndpoint(target: String): (String, Int, Option[(String, String)]) = {
    val t = target.stripPrefix("mqtt://")
    val atPos = t.lastIndexOf('@')
    // the refusal message REDACTS userinfo: it lands in driver logs,
    // task failure messages, and test reports — never echo a password
    def bad = s"mqtt:// target must be mqtt://host:port " +
      "(optionally user:pass@host:port), got mqtt://" +
      (if (atPos < 0) t else s"<credentials>@${t.substring(atPos + 1)}")
    val (creds, hp) =
      if (atPos < 0) (None, t)
      else {
        val ui = t.substring(0, atPos)
        val c = ui.indexOf(':')
        (Some(if (c < 0) (ui, "")
              else (ui.substring(0, c), ui.substring(c + 1))), t.substring(atPos + 1))
      }
    val cut = hp.lastIndexOf(':')
    require(cut > 0, bad)
    val host = hp.substring(0, cut)
    val portStr = hp.substring(cut + 1)
    require(!host.contains(':') && portStr.nonEmpty && portStr.forall(_.isDigit), bad)
    (host, portStr.toInt, creds)
  }

  /** Parse a CONNECT body's (clientId, username, password) — the broker
    * side of [[connectBody]]. Returns null when the body is malformed
    * (a truncated packet whose length-prefixed fields overrun the body
    * must drop the line, not kill the serving thread). */
  def parseConnect(p: Packet): (String, Option[(String, String)]) = {
    def str(b: Array[Byte], off: Int): (String, Int) = {
      val len = ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
      (new String(b, off + 2, len, StandardCharsets.UTF_8), off + 2 + len)
    }
    try {
      val (_, afterProto) = str(p.body, 0) // "MQTT"
      val flags = p.body(afterProto + 1) & 0xFF
      val (clientId, afterId) = str(p.body, afterProto + 4) // level+flags+keepalive
      val creds =
        if ((flags & 0x80) != 0) {
          val (u, afterU) = str(p.body, afterId)
          val pw = if ((flags & 0x40) != 0) str(p.body, afterU)._1 else ""
          Some((u, pw))
        } else None
      (clientId, creds)
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: StringIndexOutOfBoundsException => null
    }
  }

  /** PUBLISH body + the flag nibble that must accompany it. */
  def publishBody(topic: String, payload: Array[Byte], qos: Int,
                  packetId: Int, dup: Boolean): (Array[Byte], Int) = {
    require(qos == 0 || qos == 1, s"wire client supports QoS 0/1, got $qos")
    val vh = utf8(topic) ++ (if (qos > 0) u16(packetId) else Array.empty[Byte])
    val flags = (if (dup) 0x08 else 0) | (qos << 1)
    (vh ++ payload, flags)
  }

  /** Parsed inbound PUBLISH: (topic, payload, qos, packetId) — null when
    * the body is malformed (declared topic length overruns the packet):
    * the broker parses untrusted client bytes and the client parses
    * whatever the socket delivers, so a torn packet must drop the line,
    * never kill a serving thread with an index error. Same never-throw
    * discipline as the media byte parsers. */
  def parsePublish(p: Packet): (String, Array[Byte], Int, Int) = {
    try {
      val qos = (p.flags >>> 1) & 0x03
      // both QoS bits set is MALFORMED per the spec ([MQTT-3.3.1-4]:
      // "a PUBLISH Packet MUST NOT have both QoS bits set to 1") — the
      // receiver must close the network connection, same as a torn body
      if (qos == 3) return null
      val tlen = ((p.body(0) & 0xFF) << 8) | (p.body(1) & 0xFF)
      val topic = new String(p.body, 2, tlen, StandardCharsets.UTF_8)
      var off = 2 + tlen
      val pid = if (qos > 0) {
        val id = ((p.body(off) & 0xFF) << 8) | (p.body(off + 1) & 0xFF)
        off += 2; id
      } else 0
      (topic, p.body.drop(off), qos, pid)
      // an overrunning declared length lands here via the String/array
      // bounds checks — no explicit off guard needed (or reachable)
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: StringIndexOutOfBoundsException => null
    }
  }
}

/** Minimal blocking MQTT 3.1.1 client over a TCP socket. One socket, one
  * reader; publish-side calls are synchronized (the reference holds one
  * mosquitto session per producer the same way). `socketFactory` is the
  * TLS seam — pass `javax.net.ssl.SSLSocketFactory.getDefault`-backed
  * sockets for a TLS broker; defaults to plain TCP. */
class MqttWireClient(host: String, port: Int, clientId: String,
                     credentials: Option[(String, String)] = None,
                     socketFactory: (String, Int) => Socket =
                       (h, p) => { val s = new Socket(); s.connect(new InetSocketAddress(h, p), 10000); s }) {
  import MqttCodec._

  private val socket = socketFactory(host, port)
  socket.setTcpNoDelay(true)
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val nextPacketId = new AtomicInteger(1)
  private val closed = new AtomicBoolean(false)

  /** CONNECT → CONNACK(0). Clean session, keepalive 0 (disabled — the
    * spec's "no keepalive" mode; callers with idle long-lived sessions
    * fire [[ping]] on their own cadence). Credentials (the reference's
    * settings username/password) ride the CONNECT flags per §3.1. */
  def connect(): Unit = {
    writePacket(out, Connect, 0,
      connectBody(clientId, cleanSession = true, keepAliveSecs = 0, credentials))
    val ack = readPacket(in)
    require(ack.ptype == Connack, s"expected CONNACK, got type ${ack.ptype}")
    require(ack.body.length == 2 && ack.body(1) == 0,
      s"broker refused connection: rc=${if (ack.body.length == 2) ack.body(1) else -1}")
  }

  /** Fire a PINGREQ. The PINGRESP is consumed wherever the socket is
    * being read (the publish ack wait and the subscribe loop both
    * tolerate an interleaved pong), so this is safe from a keepalive
    * timer thread. */
  def ping(): Unit = writePacket(out, Pingreq, 0, Array.empty)

  private def claimPacketId(): Int = {
    // u16, nonzero, wraps — 65535 ids in flight is far beyond this
    // client's one-at-a-time synchronous window
    var id = nextPacketId.getAndIncrement() & 0xFFFF
    if (id == 0) id = nextPacketId.getAndIncrement() & 0xFFFF
    id
  }

  /** QoS-1 publish: blocks until the broker's PUBACK for this packet id.
    * QoS 0 fires and forgets. Synchronous-per-message is the honest QoS-1
    * window-1 mode (the reference's mosquitto_publish + wait loop). */
  def publish(topic: String, payload: Array[Byte], qos: Int = 1): Unit = synchronized {
    val pid = if (qos > 0) claimPacketId() else 0
    val (body, flags) = publishBody(topic, payload, qos, pid, dup = false)
    writePacket(out, Publish, flags, body)
    if (qos > 0) {
      var acked = false
      while (!acked) {
        val p = readPacket(in)
        if (p.ptype == Puback) {
          if (p.body.length < 2) throw new IOException("truncated PUBACK")
          val got = ((p.body(0) & 0xFF) << 8) | (p.body(1) & 0xFF)
          require(got == pid, s"PUBACK for unexpected packet id $got (want $pid)")
          acked = true
        } else if (p.ptype == Pingresp) () // interleaved pong: ignore
        else throw new IOException(s"unexpected packet type ${p.ptype} awaiting PUBACK")
      }
    }
  }

  /** SUBSCRIBE one filter at QoS 1 → SUBACK, then hand the socket to a
    * read loop: `handler(topic, payload)` runs for each inbound PUBLISH
    * and the PUBACK is sent ONLY AFTER the handler returns — so a handler
    * that persists durably (the spool bridge) gets at-least-once across
    * its own crashes, the QoS-1 contract. `onSubscribed` fires right
    * after the SUBACK is validated — the happens-before edge a publisher
    * must wait on (this stub-scope broker keeps no retained messages, so
    * a publish routed before the subscription lands is gone silently).
    * Blocks until [[close]] or socket error. */
  def subscribeLoop(topicFilter: String, onSubscribed: () => Unit = () => ())
                   (handler: (String, Array[Byte]) => Unit): Unit = {
    val pid = claimPacketId()
    // SUBSCRIBE fixed-header flags are mandated 0b0010 (spec §3.8.1)
    writePacket(out, Subscribe, 0x02, u16(pid) ++ utf8(topicFilter) ++ Array[Byte](1))
    val ack = readPacket(in)
    require(ack.ptype == Suback, s"expected SUBACK, got type ${ack.ptype}")
    require(ack.body.length >= 3 && (ack.body(2) & 0xFF) <= 2,
      s"broker rejected subscription: rc=${if (ack.body.length >= 3) ack.body(2) & 0xFF else -1}")
    onSubscribed()
    try {
      while (!closed.get()) {
        val p = readPacket(in)
        p.ptype match {
          case Publish =>
            val parsed = parsePublish(p)
            if (parsed == null) throw new IOException("malformed PUBLISH from broker")
            val (topic, payload, qos, mid) = parsed
            handler(topic, payload) // durable BEFORE the ack
            if (qos > 0) writePacket(out, Puback, 0, u16(mid))
          case Pingresp => ()
          case other => throw new IOException(s"unexpected packet type $other in subscribe loop")
        }
      }
    } catch {
      case _: EOFException if closed.get() => () // orderly close() race
      case _: java.net.SocketException if closed.get() => ()
    }
  }

  def close(): Unit = if (closed.compareAndSet(false, true)) {
    try writePacket(out, Disconnect, 0, Array.empty)
    catch { case _: IOException => () }
    try socket.close() catch { case _: IOException => () }
  }
}

/** The bridge the spool scaladoc always promised ("what a tiny bridge
  * process subscribing at QoS 1 would write"), now real: subscribes over
  * the wire and writes each message into the [[MqttLike]] spool with the
  * claim-link protocol, so the graft-mqtt source's offsets, dense-prefix
  * repair, and checkpoint resume apply unchanged to broker-fed topics.
  * PUBACK is sent only after the spool hard-link lands (the subscribeLoop
  * contract), so a bridge crash can duplicate but never lose — QoS 1.
  * Runs on a daemon thread; `close()` tears down the socket. */
class MqttSpoolBridge(host: String, port: Int, spoolDir: String,
                      topicFilter: String, clientId: String = "graft-bridge",
                      credentials: Option[(String, String)] = None) {
  private val client = new MqttWireClient(host, port, clientId, credentials)
  @volatile private var error: Throwable = _
  val received = new AtomicLong(0)
  private val subscribed = new java.util.concurrent.CountDownLatch(1)

  private val thread = new Thread(() => {
    try {
      client.connect()
      client.subscribeLoop(topicFilter, onSubscribed = () => subscribed.countDown()) {
        (topic, payload) =>
          MqttLike.publish(spoolDir, topic,
            new String(payload, StandardCharsets.UTF_8))
          received.incrementAndGet()
      }
    } catch { case t: Throwable =>
      error = t
      // drop the socket with the thread: a failed bridge must not keep a
      // half-open session a late broker response could revive into an
      // untracked writer
      client.close()
      subscribed.countDown()
    }
  }, s"mqtt-spool-bridge-$clientId")
  thread.setDaemon(true)
  thread.start()

  /** True while the bridge can still deliver: its loop thread is running
    * and no failure was recorded. A cache holding bridges must replace a
    * dead one, not reuse it into silent ingress loss. */
  def isAlive: Boolean = thread.isAlive && error == null

  /** Block until the bridge's SUBSCRIBE is acked (or it failed): the
    * broker keeps no retained messages, so a message published before
    * this returns would be routed to nobody and silently lost — every
    * producer racing a fresh bridge must wait here first. Throws the
    * bridge's failure if the handshake died instead of subscribing. */
  def awaitSubscribed(timeoutMs: Long = 15000): Unit = {
    require(subscribed.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS),
      s"bridge did not subscribe within ${timeoutMs}ms")
    failure.foreach(throw _)
  }

  def failure: Option[Throwable] = Option(error)
  def close(): Unit = { client.close(); thread.join(5000) }
}

/** In-process MQTT 3.1.1 broker STUB — the integration fixture (and dev
  * utility) that lets the wire client, the bridge, and the sink be tested
  * end-to-end over real sockets with no external daemon. Scope is the
  * stub's: CONNECT/CONNACK, SUBSCRIBE/SUBACK (exact filter or a trailing
  * `#` wildcard), PUBLISH routed to matching live subscribers at QoS 1
  * (inbound QoS-1 PUBLISH is acked AFTER routing enqueues to every
  * matching session's outbound lane), PINGREQ/PINGRESP, DISCONNECT. No
  * retained messages, no persistent sessions, no QoS 2 — a production
  * deployment points the same client at a real broker. With
  * `credentials` set, CONNECT must carry the matching username/password
  * (the reference's settings keys) or the stub answers rc 4 (bad user
  * name or password, spec §3.2.2.3) and drops the line.
  * `serverSocketFactory` is the TLS seam's server half — pass an
  * `SSLContext.getServerSocketFactory`-backed factory to run the stub
  * over TLS (the reference's mosquitto listens on TLS :8883); the codec
  * and session logic are byte-identical either way. */
class MqttBrokerStub(port0: Int = 0,
                     credentials: Option[(String, String)] = None,
                     serverSocketFactory: Int => ServerSocket =
                       p => new ServerSocket(p)) {
  import MqttCodec._

  private val server = serverSocketFactory(port0)
  val port: Int = server.getLocalPort
  private val running = new AtomicBoolean(true)
  val published = new AtomicLong(0)

  private final class Session(socket: Socket) {
    val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
    val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    @volatile var filters: List[String] = Nil
    val outIds = new AtomicInteger(1)
    def matches(topic: String): Boolean = filters.exists { f =>
      f == topic || (f.endsWith("#") && topic.startsWith(f.dropRight(1)))
    }
    def deliver(topic: String, payload: Array[Byte]): Unit =
      try {
        val pid = { var i = outIds.getAndIncrement() & 0xFFFF; if (i == 0) i = outIds.getAndIncrement() & 0xFFFF; i }
        val (body, flags) = publishBody(topic, payload, qos = 1, pid, dup = false)
        writePacket(out, Publish, flags, body)
      } catch { case _: IOException => () } // dead subscriber: drop
    def close(): Unit = try socket.close() catch { case _: IOException => () }
  }

  private val sessions = ConcurrentHashMap.newKeySet[Session]()

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val s = server.accept()
        s.setTcpNoDelay(true)
        val session = new Session(s)
        sessions.add(session)
        val t = new Thread(() => serve(session), s"mqtt-stub-conn-${s.getPort}")
        t.setDaemon(true); t.start()
      } catch { case _: IOException => () } // server closed
    }
  }, "mqtt-stub-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(session: Session): Unit = {
    try {
      val first = readPacket(session.in)
      if (first.ptype != Connect) { session.close(); return }
      val parsed = parseConnect(first)
      if (parsed == null) { session.close(); return } // malformed: drop line
      if (credentials.exists(want => parsed._2 != Some(want))) {
        writePacket(session.out, Connack, 0, Array[Byte](0, 4)) // bad user/pass
        session.close(); return
      }
      writePacket(session.out, Connack, 0, Array[Byte](0, 0))
      var open = true
      while (open && running.get()) {
        val p = readPacket(session.in)
        // any malformed body (torn length fields) drops the line — a
        // hostile or buggy client must never kill a serving thread
        try p.ptype match {
          case Publish =>
            val parsed = parsePublish(p)
            if (parsed == null) open = false
            else {
              val (topic, payload, qos, pid) = parsed
              // route BEFORE acking: once the publisher sees PUBACK the
              // message is in every matching subscriber's TCP lane
              sessions.iterator().asScala.filter(_.matches(topic))
                .foreach(_.deliver(topic, payload))
              published.incrementAndGet()
              if (qos > 0) writePacket(session.out, Puback, 0, u16(pid))
            }
          case Subscribe =>
            val pid = ((p.body(0) & 0xFF) << 8) | (p.body(1) & 0xFF)
            // single-filter payload: len-prefixed filter + requested qos
            val flen = ((p.body(2) & 0xFF) << 8) | (p.body(3) & 0xFF)
            val filter = new String(p.body, 4, flen, StandardCharsets.UTF_8)
            session.filters = filter :: session.filters
            writePacket(session.out, Suback, 0, u16(pid) ++ Array[Byte](1))
          case Puback => () // subscriber acked an outbound QoS-1 delivery
          case Pingreq => writePacket(session.out, Pingresp, 0, Array.empty)
          case Disconnect => open = false
          case _ => open = false // unsupported (e.g. QoS 2 flow): drop line
        } catch {
          case _: ArrayIndexOutOfBoundsException |
               _: StringIndexOutOfBoundsException => open = false
        }
      }
    } catch {
      case _: EOFException => ()
      case _: IOException => ()
    } finally {
      sessions.remove(session)
      session.close()
    }
  }

  def close(): Unit = if (running.compareAndSet(true, false)) {
    try server.close() catch { case _: IOException => () }
    sessions.iterator().asScala.foreach(_.close())
  }
}
