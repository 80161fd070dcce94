package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative wire-protocol fuzz for the MQTT codec and broker stub —
  * the MediaFuzzSpec discipline (seeded ScalaCheck, refuse-loudly /
  * never-hang / never-OOM) applied to the transport layer (r12 verdict
  * #4). Every parser here consumes UNTRUSTED socket bytes: the broker
  * parses hostile clients, the client parses whatever the network
  * delivers. The invariants under fuzz:
  *
  *  - pure parsers (parsePublish/parseConnect) return null on any torn or
  *    corrupted body, and NEVER throw — an index error on a serving
  *    thread is a remote kill switch;
  *  - framing (readPacket) refuses an oversized declared length BEFORE
  *    allocating (the OOM vector) and malformed varints with a
  *    descriptive IOException;
  *  - round-trips are exact: what writePacket/publishBody/connectBody
  *    encode, readPacket/parsePublish/parseConnect decode bit-for-bit,
  *    for every QoS, DUP flag, unicode topic and binary payload;
  *  - the broker stub drops a hostile line and KEEPS SERVING — garbage
  *    streams, torn frames and interleaved control packets never wedge
  *    the acceptor or leak a serving thread into an infinite loop.
  *
  * No Spark session: this suite exercises sockets and byte arrays only.
  */
class MqttWireFuzzSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ---- pure codec properties ------------------------------------------

  test("varint remaining length round-trips over the full admissible range") {
    val gen = Gen.oneOf(
      Gen.chooseNum(0, 127), Gen.chooseNum(128, 16383),
      Gen.chooseNum(16384, 2097151), Gen.chooseNum(2097152, 268435455))
    for (i <- 0 until 500) {
      val n = sample(gen, 0xA001 + i)
      val bos = new ByteArrayOutputStream()
      MqttCodec.writeRemainingLength(new DataOutputStream(bos), n)
      val back = MqttCodec.readRemainingLength(
        new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
      assert(back == n, s"varint $n -> $back")
    }
    // a fifth continuation byte is malformed per spec §2.2.3 — refuse,
    // don't spin or mis-accumulate
    val five = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x01)
    val e = intercept[IOException] {
      MqttCodec.readRemainingLength(new DataInputStream(new ByteArrayInputStream(five)))
    }
    assert(e.getMessage.contains("malformed remaining length"))
  }

  test("PUBLISH encode/parse round-trips for every QoS, DUP flag, unicode " +
    "topic and binary payload") {
    val topicGen = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"t/${s.take(32)}"),
      Gen.const("传感器/温度"), Gen.const("sensors/ü/#-adjacent"), Gen.const("a"))
    val payloadGen = Gen.chooseNum(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    for (i <- 0 until 300) {
      val topic = sample(topicGen, 0xB000 + i)
      val payload = sample(payloadGen, 0xB500 + i)
      val qos = i % 3
      val dup = (i & 1) == 1 && qos > 0 // DUP on a QoS-0 publish is spec-invalid
      val pid = 1 + (i * 37) % 0xFFFF
      val (body, flags) = MqttCodec.publishBody(topic, payload, qos, pid, dup)
      assert(((flags >>> 1) & 3) == qos)
      assert(((flags >>> 3) & 1) == (if (dup) 1 else 0))
      val parsed = MqttCodec.parsePublish(MqttCodec.Packet(MqttCodec.Publish, flags, body))
      assert(parsed != null, s"valid publish refused (i=$i topic=$topic)")
      val (t2, p2, q2, pid2) = parsed
      assert(t2 == topic && q2 == qos && java.util.Arrays.equals(p2, payload))
      if (qos > 0) assert(pid2 == pid)
    }
  }

  test("CONNECT encode/parse round-trips: clean-session flag, credential " +
    "presence, empty and unicode fields") {
    val strGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(23)), Gen.const("graft-∆"),
      Gen.const(""), Gen.const("user:with@delims"))
    for (i <- 0 until 300) {
      val cid = sample(strGen, 0xC000 + i)
      val clean = (i & 1) == 0
      val creds = if (i % 3 == 0) None
        else Some((sample(strGen, 0xC500 + i), sample(strGen, 0xC900 + i)))
      val body = MqttCodec.connectBody(cid, clean, keepAliveSecs = i % 120, creds)
      val parsed = MqttCodec.parseConnect(MqttCodec.Packet(MqttCodec.Connect, 0, body))
      assert(parsed != null)
      assert(parsed == ((cid, clean, creds)), s"i=$i")
    }
  }

  test("parsers never throw on random bodies, truncations of valid packets, " +
    "or corrupted flag nibbles — null, not a crash") {
    val bytesGen = Gen.chooseNum(0, 96).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    for (i <- 0 until 2000) {
      val junk = sample(bytesGen, 0xD000 + i)
      // must not throw; null (refusal) or a parse are both acceptable
      MqttCodec.parsePublish(MqttCodec.Packet(MqttCodec.Publish, i % 16, junk))
      MqttCodec.parseConnect(MqttCodec.Packet(MqttCodec.Connect, 0, junk))
      MqttCodec.ackPacketId(MqttCodec.Packet(MqttCodec.Puback, 0, junk))
    }
    // every truncation of a valid QoS-2 publish body: parse or refuse,
    // never throw (the declared topic length overruns the torn body)
    val (valid, flags) = MqttCodec.publishBody("sensors/深/dd",
      "payload-bytes".getBytes("UTF-8"), qos = 2, packetId = 777, dup = false)
    (0 until valid.length).foreach { n =>
      MqttCodec.parsePublish(MqttCodec.Packet(MqttCodec.Publish, flags, valid.take(n)))
    }
    val truncConnect = MqttCodec.connectBody("cid", cleanSession = true,
      keepAliveSecs = 0, Some(("user", "pass")))
    (0 until truncConnect.length).foreach { n =>
      MqttCodec.parseConnect(MqttCodec.Packet(MqttCodec.Connect, 0, truncConnect.take(n)))
    }
    // both QoS bits set ([MQTT-3.3.1-4]) is refused whatever the body
    for (i <- 0 until 50) {
      val junk = sample(bytesGen, 0xE000 + i)
      assert(MqttCodec.parsePublish(MqttCodec.Packet(MqttCodec.Publish, 0x06, junk)) == null)
    }
  }

  test("readPacket refuses an oversized declared length BEFORE allocating " +
    "(the hostile-header OOM vector)") {
    // a fixed header claiming the spec-max 256 MB body, followed by no body
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(MqttCodec.Publish << 4)
    MqttCodec.writeRemainingLength(out, 268435455)
    val e = intercept[IOException] {
      MqttCodec.readPacket(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    }
    assert(e.getMessage.contains("exceeds cap"), e.getMessage)
    // at exactly the cap the read proceeds (and EOFs on the missing body,
    // proving the refusal is the length check, not the allocation)
    val bos2 = new ByteArrayOutputStream()
    val out2 = new DataOutputStream(bos2)
    out2.writeByte(MqttCodec.Publish << 4)
    MqttCodec.writeRemainingLength(out2, MqttCodec.MaxPacketBytes)
    intercept[EOFException] {
      MqttCodec.readPacket(new DataInputStream(new ByteArrayInputStream(bos2.toByteArray)))
    }
  }

  // ---- broker-stub fuzz over real sockets -----------------------------

  /** Drive one hostile byte stream at a fresh connection, then prove the
    * broker still serves a polite session end-to-end. */
  private def assaultThenVerify(broker: MqttBrokerStub, round: Int)
                               (assault: DataOutputStream => Unit): Unit = {
    val s = new java.net.Socket("127.0.0.1", broker.port)
    try {
      s.setSoTimeout(5000)
      val out = new DataOutputStream(s.getOutputStream)
      try assault(out)
      catch { case _: IOException => () } // broker already dropped the line
    } finally s.close()
    val before = broker.published.get()
    val ok = new MqttWireClient("127.0.0.1", broker.port, s"polite-$round")
    try {
      ok.connect()
      ok.publish("t/after-assault", s"r$round".getBytes("UTF-8"))
    } finally ok.close()
    assert(broker.published.get() == before + 1,
      s"broker stopped serving after assault round $round")
  }

  test("broker stub survives generative garbage streams: random packets, " +
    "torn frames, oversized lengths, flag corruption, interleaved pings") {
    val broker = new MqttBrokerStub()
    val bytesGen = Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    try {
      // raw random bytes straight at the CONNECT parser
      for (r <- 0 until 5) assaultThenVerify(broker, r) { out =>
        out.write(sample(bytesGen, 0xF000 + r)); out.flush()
      }
      // valid CONNECT, then garbage packets with random types and flags
      for (r <- 5 until 10) assaultThenVerify(broker, r) { out =>
        MqttCodec.writePacket(out, MqttCodec.Connect, 0,
          MqttCodec.connectBody(s"fuzz-$r", cleanSession = true, keepAliveSecs = 0))
        for (k <- 0 until 8) {
          val body = sample(bytesGen, 0xF100 + r * 8 + k)
          MqttCodec.writePacket(out, 1 + (r * 7 + k) % 14, (r + k) % 16, body)
        }
      }
      // a declared length beyond the cap must drop the line, not allocate
      assaultThenVerify(broker, 10) { out =>
        MqttCodec.writePacket(out, MqttCodec.Connect, 0,
          MqttCodec.connectBody("fuzz-oom", cleanSession = true, keepAliveSecs = 0))
        out.writeByte(MqttCodec.Publish << 4)
        MqttCodec.writeRemainingLength(out, 268435455)
        out.flush()
      }
      // a torn frame: header promising more bytes than ever arrive (the
      // serving thread must sit on readFully, then EOF when we close)
      assaultThenVerify(broker, 11) { out =>
        MqttCodec.writePacket(out, MqttCodec.Connect, 0,
          MqttCodec.connectBody("fuzz-torn", cleanSession = true, keepAliveSecs = 0))
        out.writeByte(MqttCodec.Publish << 4)
        MqttCodec.writeRemainingLength(out, 64)
        out.write(Array.fill[Byte](10)(0x41)) // 10 of the promised 64
        out.flush()
      }
      // PINGREQs interleaved with malformed SUBSCRIBEs
      assaultThenVerify(broker, 12) { out =>
        MqttCodec.writePacket(out, MqttCodec.Connect, 0,
          MqttCodec.connectBody("fuzz-ping", cleanSession = true, keepAliveSecs = 0))
        MqttCodec.writePacket(out, MqttCodec.Pingreq, 0, Array.empty)
        MqttCodec.writePacket(out, MqttCodec.Subscribe, 0x02,
          Array[Byte](0, 1, 0x7F, 0x7F, 'a')) // filter length overruns body
      }
      // QoS-2 handshake packets in hostile orders: PUBREL for an id never
      // published, PUBREC out of nowhere, truncated ack bodies
      assaultThenVerify(broker, 13) { out =>
        MqttCodec.writePacket(out, MqttCodec.Connect, 0,
          MqttCodec.connectBody("fuzz-q2", cleanSession = true, keepAliveSecs = 0))
        MqttCodec.writePacket(out, MqttCodec.Pubrel, 0x02, MqttCodec.u16(999))
        MqttCodec.writePacket(out, MqttCodec.Pubrec, 0, MqttCodec.u16(42))
        MqttCodec.writePacket(out, MqttCodec.Pubcomp, 0, Array.empty) // torn
      }
    } finally broker.close()
  }

  test("broker stub: a subscriber flooded with hostile publishes still sees " +
    "only well-formed routed messages (malformed ones drop their line)") {
    val broker = new MqttBrokerStub()
    try {
      val got = new java.util.concurrent.LinkedBlockingQueue[String]()
      val sub = new MqttWireClient("127.0.0.1", broker.port, "fuzz-sub")
      val subscribed = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => {
        sub.connect()
        sub.subscribeLoop("t/fz", onSubscribed = () => subscribed.countDown()) {
          (_, p) => got.put(new String(p, "UTF-8"))
        }
      })
      t.setDaemon(true); t.start()
      assert(subscribed.await(15, java.util.concurrent.TimeUnit.SECONDS))
      // hostile publisher: torn PUBLISH (declared topic overruns), then a
      // valid one on a NEW line — only the valid one may reach the sub
      val s = new java.net.Socket("127.0.0.1", broker.port)
      val out = new DataOutputStream(s.getOutputStream)
      MqttCodec.writePacket(out, MqttCodec.Connect, 0,
        MqttCodec.connectBody("fuzz-pub", cleanSession = true, keepAliveSecs = 0))
      MqttCodec.writePacket(out, MqttCodec.Publish, 0,
        Array[Byte](0x7F, 0x7F, 't')) // declared 32k topic, 1-byte body
      s.close()
      val ok = new MqttWireClient("127.0.0.1", broker.port, "fuzz-pub-ok")
      ok.connect()
      ok.publish("t/fz", "clean".getBytes("UTF-8"))
      ok.close()
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "clean")
      assert(got.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "a malformed publish leaked through routing")
      sub.close(); t.join(5000)
    } finally broker.close()
  }
}
