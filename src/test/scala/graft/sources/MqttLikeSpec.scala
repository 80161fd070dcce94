package graft.sources

import graft.SparkTestBase
import graft.streaming.Pipelines
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import scala.jdk.CollectionConverters._

/** End-to-end connector test: the reference's dd producer→broker→consumer
  * path (SURVEY §3.1/§3.2) over the graft-mqtt DataSourceV2. */
class MqttLikeSpec extends SparkTestBase {

  private def payload(i: Int): String =
    s"""{"timestamp_utc": "2024-12-23T08:00:0${i}Z", "temp_outdoor_celsius": ${20 + i}.5, "temp_indoor_celsius": 22.8, "rh_outdoor": 61.0}"""

  test("micro-batch read: offsets advance with published messages, exactly-once ranges") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt").toString
    (0 until 3).foreach(i => MqttLike.publish(spool, "sensors/dd", payload(i)))

    val stream = spark.readStream.format("graft-mqtt")
      .option("spoolDir", spool).option("topic", "sensors/dd").load()
    val q = stream.writeStream.format("memory").queryName("mq1")
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("mq1").count() == 3)
      // publish two more while the query is live
      (3 until 5).foreach(i => MqttLike.publish(spool, "sensors/dd", payload(i)))
      q.processAllAvailable()
      val rows = spark.table("mq1").orderBy("msg_seq").collect()
      assert(rows.length == 5, "no loss, no duplication")
      assert(rows.map(_.getAs[Long]("msg_seq")).toSeq == (0L until 5L))
      assert(rows.forall(_.getAs[String]("topic") == "sensors/dd"))
    } finally q.stop()
  }

  test("concurrent publishers: no message lost or overwritten, seqs stay dense") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt_conc").toString
    val n = 200
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = MqttLike.publish(spool, "t/conc", s"msg-$i")
        })
      }
      futures.foreach(_.get()) // propagate any writer exception
    } finally pool.shutdown()
    val dir = java.nio.file.Paths.get(spool, "t_conc")
    val seqs = MqttLike.listSeqs(dir)
    assert(seqs.size == n, s"lost ${n - seqs.size} messages to writer races")
    assert(seqs == (0L until n.toLong), "seqs must stay dense from 0")
    val bodies = seqs.map(s => java.nio.file.Files.readString(dir.resolve(s"$s.msg"))).toSet
    assert(bodies.size == n, "a payload was truncated/overwritten by a concurrent writer")
    assert(MqttLike.densePrefix(dir) == n.toLong)
  }

  test("publisher crash between claim and publish cannot wedge the topic") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt_crash").toString
    val dir = java.nio.file.Paths.get(spool, "t_crash")
    MqttLike.publish(spool, "t/crash", "msg-0")
    // simulate a publisher that died after claiming seq 1 but before
    // publishing: contentful claim link present, no 1.msg (exactly the state
    // publish() leaves between its link and promote steps)
    val tmp = dir.resolve(".pub-deadbeef.tmp")
    java.nio.file.Files.writeString(tmp, "msg-1-from-crashed-writer")
    java.nio.file.Files.createLink(dir.resolve(".1.claim"), tmp)
    assert(MqttLike.densePrefix(dir) == 1L, "gap at seq 1 holds the prefix")
    // any later publisher repairs the gap before claiming its own slot
    val seq = MqttLike.publish(spool, "t/crash", "msg-2")
    assert(seq == 2L, "crashed writer's claim must keep its slot")
    assert(MqttLike.densePrefix(dir) == 3L, "repair must unwedge the prefix")
    assert(java.nio.file.Files.readString(dir.resolve("1.msg"))
      == "msg-1-from-crashed-writer", "recovered payload must be intact")
  }

  test("reader self-heals a wedged topic with no further publishes") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt_heal").toString
    val dir = java.nio.file.Paths.get(spool, "t_heal")
    (0 until 2).foreach(i => MqttLike.publish(spool, "t/heal", s"m$i"))
    val tmp = dir.resolve(".pub-dead.tmp")
    java.nio.file.Files.writeString(tmp, "m2-crashed")
    java.nio.file.Files.createLink(dir.resolve(".2.claim"), tmp)
    assert(MqttLike.densePrefix(dir) == 2L)
    // no publisher ever returns; the streaming reader's offset poll repairs
    val stream = spark.readStream.format("graft-mqtt")
      .option("spoolDir", spool).option("topic", "t/heal").load()
    val q = stream.writeStream.format("memory").queryName("mq_heal")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("mq_heal").orderBy("msg_seq").collect()
      assert(rows.map(_.getAs[Long]("msg_seq")).toSeq == (0L until 3L))
      assert(rows.last.getAs[String]("payload") == "m2-crashed")
    } finally q.stop()
  }

  test("checkpoint recovery: restarted query resumes from committed offsets") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt_ckpt").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("ckpt_out").toString
    (0 until 3).foreach(i => MqttLike.publish(spool, "s/t", payload(i)))
    def start() = spark.readStream.format("graft-mqtt")
      .option("spoolDir", spool).option("topic", "s/t").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode(OutputMode.Append()).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 3)
    // new messages arrive while the query is down
    (3 until 5).foreach(i => MqttLike.publish(spool, "s/t", payload(i)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val seqs = spark.read.parquet(out).select("msg_seq").collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq == (0L until 5L),
      s"restart must resume exactly once after the checkpointed offset, got ${seqs.toSeq}")
  }

  test("partitioned sink at parallelism > 1: per-writer lanes, reader merges exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val spool = java.nio.file.Files.createTempDirectory("mqtt_lanes").toString
    val n = 64
    val input = MemoryStream[Int](spark)
    val q = input.toDS().repartition(4)
      .select(concat(lit("payload-"), col("value")).as("payload"))
      .writeStream
      .foreach(new Sinks.MqttLikePublishWriter(spool, "t/hi", qos = 1, partitioned = true))
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(0 until n)
      q.processAllAvailable()
    } finally q.stop()
    val topicDir = java.nio.file.Paths.get(spool, "t_hi")
    val lanes = MqttLike.listSubstreams(topicDir).filter(_.nonEmpty)
    assert(lanes.size > 1, s"expected several writer lanes, got $lanes")
    lanes.foreach { lane => // each lane keeps its own dense seq space
      val seqs = MqttLike.listSeqs(topicDir.resolve(lane))
      assert(seqs == (0L until seqs.size.toLong), s"$lane seqs not dense: $seqs")
    }
    // the reader merges all lanes, no loss, no duplication
    val q2 = spark.readStream.format("graft-mqtt")
      .option("spoolDir", spool).option("topic", "t/hi").load()
      .writeStream.format("memory").queryName("mq_lanes")
      .outputMode(OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      val rows = spark.table("mq_lanes").collect()
      assert(rows.length == n, s"expected $n rows, got ${rows.length}")
      assert(rows.map(_.getAs[String]("payload")).toSet ==
        (0 until n).map(i => s"payload-$i").toSet)
      assert(rows.map(_.getAs[String]("writer")).toSet == lanes.toSet)
      // (writer, msg_seq) identifies a message uniquely across lanes
      assert(rows.map(r => (r.getAs[String]("writer"), r.getAs[Long]("msg_seq"))).toSet.size == n)
    } finally q2.stop()
  }

  test("full dd pipeline: mqtt source -> parse -> publish sink (K1), dashboard (K3)") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt2").toString
    (0 until 4).foreach(i => MqttLike.publish(spool, "sensors/dd", payload(i)))
    MqttLike.publish(spool, "sensors/dd", "garbage not json") // dead-letter path

    val parsed = Pipelines.ddConsumer(
      spark.readStream.format("graft-mqtt")
        .option("spoolDir", spool).option("topic", "sensors/dd").load())

    // K1 republish of enriched payloads via ForeachWriter
    val outPayloads = parsed.filter(col("parsed"))
      .select(to_json(struct(col("ts"), col("temp_outdoor_celsius"))).as("payload"))
    val q1 = outPayloads.writeStream
      .foreach(new Sinks.MqttLikePublishWriter(spool, "sensors/dd_enriched", qos = 1))
      .outputMode(OutputMode.Append()).start()
    try q1.processAllAvailable() finally q1.stop()
    assert(MqttLike.listSeqs(java.nio.file.Paths.get(spool, "sensors_dd_enriched")).size == 4)

    // K3 dashboard: latest value per key
    val (view, upsert) = Sinks.dashboardSink(
      "key", "ts", "temp_outdoor_celsius")
    val q2 = parsed.filter(col("parsed")).withColumn("key", lit("outdoor"))
      .writeStream.foreachBatch(upsert).outputMode(OutputMode.Append()).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(view.get("outdoor") != null)
    assert(view.get("outdoor")._2 == 23.5) // latest published reading (i=3)
  }

  test("dashboard upsert survives keys whose rows carry null ts/value") {
    import spark.implicits._
    val (view, upsert) = Sinks.dashboardSink("key", "ts", "v")
    upsert(Seq(("a", Some(new java.sql.Timestamp(1000L)), Some(1.5)),
      ("b", None: Option[java.sql.Timestamp], None: Option[Double]))
      .toDF("key", "ts", "v"), 0L)
    assert(view.get("a") == ((new java.sql.Timestamp(1000L), 1.5)))
    assert(view.get("b") == null, "all-null key must not poison the view or NPE")
    // a later batch with real values for b lands normally
    upsert(Seq(("b", Some(new java.sql.Timestamp(2000L)), Some(9.0)))
      .toDF("key", "ts", "v"), 1L)
    assert(view.get("b")._2 == 9.0)
  }

  test("publishFrom with a stale seq hint resyncs through collision repair") {
    val spool = java.nio.file.Files.createTempDirectory("stale").toString
    (0 until 5).foreach(i => MqttLike.publish(spool, "t/stale", s"m$i"))
    // hint far behind reality: the claim walk must collide, resync, and
    // land on the next free slot without overwriting anything
    val seq = MqttLike.publishFrom(spool, "t/stale", "late", "", startSeq = 0L)
    assert(seq == 5L, s"stale hint must resync to the next free seq, got $seq")
    val dir = java.nio.file.Paths.get(spool, "t_stale")
    assert(MqttLike.densePrefix(dir) == 6L)
    assert(java.nio.file.Files.readString(dir.resolve("5.msg")) == "late")
    assert(java.nio.file.Files.readString(dir.resolve("0.msg")) == "m0")
  }

  test("publishFrom with a too-high seq hint resyncs instead of leaving a hole") {
    val spool = java.nio.file.Files.createTempDirectory("ahead").toString
    (0 until 3).foreach(i => MqttLike.publish(spool, "t/ahead", s"m$i"))
    // a hint ahead of the next free slot would claim seq 10 with no
    // collision, leaving 3..9 as a permanent densePrefix stall
    val seq = MqttLike.publishFrom(spool, "t/ahead", "next", "", startSeq = 10L)
    assert(seq == 3L, s"ahead hint must resync to the next free seq, got $seq")
    assert(MqttLike.densePrefix(java.nio.file.Paths.get(spool, "t_ahead")) == 4L)
    // fresh lane: an ahead hint lands at 0, not at the hint
    val s0 = MqttLike.publishFrom(spool, "t/ahead2", "first", "", startSeq = 7L)
    assert(s0 == 0L, s"fresh-lane ahead hint must land at 0, got $s0")
  }

  test("SeqOffset: hostile lane names round-trip; legacy formats parse unchanged") {
    // lanes are DIRECTORY names an external bridge may create — delimiter
    // and quote characters must survive the checkpoint round trip
    val hostile = SeqOffset(Map("w-host:3" -> 5L, "w-a,b" -> 2L,
      "w-50%" -> 1L, "w-q\"x" -> 7L, "" -> 9L))
    assert(SeqOffset.parse(hostile.json()) == hostile,
      s"round trip corrupted: ${hostile.json()}")
    // legacy (pre-encoding) checkpoint shapes keep resuming
    assert(SeqOffset.parse("""{"w-0":5,"":3}""") ==
      SeqOffset(Map("w-0" -> 5L, "" -> 3L)))
    assert(SeqOffset.parse("7") == SeqOffset(7L))
    // a literal '%' not followed by two hex digits stays literal
    assert(SeqOffset.parse("""{"a%zb":1}""") == SeqOffset(Map("a%zb" -> 1L)))
    // non-Latin-1 whitespace (U+2028 LINE SEPARATOR, which isWhitespace
    // matches) encodes as its UTF-8 bytes — a single "%2028" escape would
    // decode as ' ' + "28" and corrupt the lane on checkpoint round trip
    val wide = SeqOffset(Map(s"w x" -> 3L, "w y" -> 1L, "läne:ü" -> 2L))
    assert(SeqOffset.parse(wide.json()) == wide,
      s"wide-char round trip corrupted: ${wide.json()}")
  }

  test("dashboard upsert accepts a corrected reading at the SAME timestamp") {
    import spark.implicits._
    val (view, upsert) = Sinks.dashboardSink("k", "ts", "v")
    val t = new java.sql.Timestamp(1700000000000L)
    upsert(Seq(("a", t, 1.0)).toDF("k", "ts", "v"), 0L)
    upsert(Seq(("a", t, 2.5)).toDF("k", "ts", "v"), 1L)
    assert(view.get("a") == ((t, 2.5)),
      "a same-ts republish (corrected reading) must replace the stale value")
    // and an OLDER ts still never regresses the view
    upsert(Seq(("a", new java.sql.Timestamp(1600000000000L), 9.9))
      .toDF("k", "ts", "v"), 2L)
    assert(view.get("a") == ((t, 2.5)))
  }

  test("publish sink skips a null payload instead of wedging the query") {
    import spark.implicits._
    val spool = java.nio.file.Files.createTempDirectory("nullpay").toString
    val w = new Sinks.MqttLikePublishWriter(spool, "t/np", qos = 1)
    assert(w.open(0L, 0L))
    // schema'd rows (process resolves the payload column by name); the
    // middle row's payload is null — it must not throw, because task
    // retries deterministically replay the same batch
    Seq(Some("ok-1"), None, Some("ok-2")).toDF("payload")
      .collect().foreach(w.process)
    w.close(null)
    val dir = java.nio.file.Paths.get(spool, "t_np")
    assert(MqttLike.listSeqs(dir) == Seq(0L, 1L), "non-null payloads publish densely")
    assert(java.nio.file.Files.readString(dir.resolve("1.msg")) == "ok-2")
  }

  // ---- real MQTT 3.1.1 wire transport (r11 verdict #3) ----

  test("MQTT codec: remaining-length varint round-trips at every boundary; " +
    "PUBLISH encode/parse round-trips") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
    // spec §2.2.3 boundary values: 0/127 one byte, 128/16383 two,
    // 16384/2097151 three, 2097152/268435455 four
    for (n <- Seq(0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455)) {
      val bos = new ByteArrayOutputStream()
      MqttCodec.writeRemainingLength(new DataOutputStream(bos), n)
      val expectBytes = n match {
        case v if v < 128 => 1
        case v if v < 16384 => 2
        case v if v < 2097152 => 3
        case _ => 4
      }
      assert(bos.size == expectBytes, s"$n encoded in ${bos.size} bytes")
      val back = MqttCodec.readRemainingLength(
        new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
      assert(back == n, s"varint round trip: $n -> $back")
    }
    val (body, flags) = MqttCodec.publishBody("sensors/dd",
      "hello".getBytes("UTF-8"), qos = 1, packetId = 42, dup = false)
    assert(flags == 0x02, "QoS-1 non-dup non-retain flag nibble")
    val (topic, payload, qos, pid) = MqttCodec.parsePublish(
      MqttCodec.Packet(MqttCodec.Publish, flags, body))
    assert((topic, new String(payload, "UTF-8"), qos, pid) ==
      (("sensors/dd", "hello", 1, 42)))
  }

  test("wire publish -> broker stub -> spool bridge -> graft-mqtt source: " +
    "end-to-end over a real socket, offsets and resume intact") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt_wire").toString
    val broker = new MqttBrokerStub()
    val bridge = new MqttSpoolBridge("127.0.0.1", broker.port, spool, "sensors/#")
    try {
      // no retained messages in the stub: a publish racing the bridge's
      // async SUBSCRIBE would be routed to nobody and silently lost
      bridge.awaitSubscribed()
      // the producer side: a real CONNECT/PUBLISH/PUBACK session
      val pub = new MqttWireClient("127.0.0.1", broker.port, "graft-producer")
      pub.connect()
      (0 until 5).foreach(i => pub.publish("sensors/dd", payload(i).getBytes("UTF-8")))
      pub.close()
      // QoS-1 PUBACK confirms broker receipt, not bridge receipt — poll
      // the bridge's durable-write counter before reading the spool
      val deadline = System.currentTimeMillis() + 15000
      while (bridge.received.get() < 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      bridge.failure.foreach(throw _)
      assert(bridge.received.get() == 5, s"bridge received ${bridge.received.get()}/5")
      // the spool now carries the wire messages under the normal contract:
      // dense seqs, same DataSourceV2 read path, checkpoints untouched
      val stream = spark.readStream.format("graft-mqtt")
        .option("spoolDir", spool).option("topic", "sensors/dd").load()
      val q = stream.writeStream.format("memory").queryName("mq_wire")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        val rows = spark.table("mq_wire").orderBy("msg_seq").collect()
        assert(rows.length == 5)
        assert(rows.map(_.getAs[Long]("msg_seq")).toSeq == (0L until 5L))
        assert(rows.map(_.getAs[String]("payload")).toSeq ==
          (0 until 5).map(payload))
      } finally q.stop()
    } finally { bridge.close(); broker.close() }
  }

  test("publish sink over mqtt:// URI: streaming foreach publishes through " +
    "the broker and lands in the subscribed spool") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val spool = java.nio.file.Files.createTempDirectory("mqtt_wire_sink").toString
    val broker = new MqttBrokerStub()
    val bridge = new MqttSpoolBridge("127.0.0.1", broker.port, spool, "t/wire")
    try {
      bridge.awaitSubscribed()
      val n = 16
      val input = MemoryStream[Int](spark)
      val q = input.toDS().coalesce(1)
        .select(concat(lit("wire-"), col("value")).as("payload"))
        .writeStream
        .foreach(new Sinks.MqttLikePublishWriter(
          s"mqtt://127.0.0.1:${broker.port}", "t/wire", qos = 1))
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(0 until n)
        q.processAllAvailable()
      } finally q.stop()
      val deadline = System.currentTimeMillis() + 15000
      while (bridge.received.get() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      bridge.failure.foreach(throw _)
      val dir = java.nio.file.Paths.get(spool, "t_wire")
      val seqs = MqttLike.listSeqs(dir)
      assert(seqs == (0L until n.toLong), s"spool seqs not dense: $seqs")
      val bodies = seqs.map(s => java.nio.file.Files.readString(dir.resolve(s"$s.msg"))).toSet
      assert(bodies == (0 until n).map(i => s"wire-$i").toSet)
    } finally { bridge.close(); broker.close() }
  }

  test("CONNECT credentials: right user/pass connects and publishes, wrong " +
    "pass is refused with rc 4") {
    val broker = new MqttBrokerStub(credentials = Some(("ref-user", "ref-pass")))
    try {
      val good = new MqttWireClient("127.0.0.1", broker.port, "c-good",
        credentials = Some(("ref-user", "ref-pass")))
      good.connect()
      good.publish("t/auth", "hello".getBytes("UTF-8")) // PUBACK round-trips
      good.close()
      // refusal is TYPED with the rc, so a bridge can tell terminal
      // credential failures (rc 4/5) from a restarting broker (rc 3)
      val bad = new MqttWireClient("127.0.0.1", broker.port, "c-bad",
        credentials = Some(("ref-user", "wrong")))
      val e = intercept[MqttCodec.ConnectRefused] { bad.connect() }
      assert(e.rc == 4 && e.getMessage.contains("rc=4"), e.getMessage)
      bad.close()
      val anon = new MqttWireClient("127.0.0.1", broker.port, "c-anon")
      val e2 = intercept[MqttCodec.ConnectRefused] { anon.connect() }
      assert(e2.rc == 4, e2.getMessage)
      anon.close()
    } finally broker.close()
  }

  test("MQTT codec fuzz: random and truncated packet bodies never throw " +
    "(the MediaFuzzSpec discipline on the wire parsers)") {
    val rnd = new scala.util.Random(0x51DE)
    (0 until 5000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      MqttCodec.parsePublish(MqttCodec.Packet(MqttCodec.Publish, rnd.nextInt(16), b))
      MqttCodec.parseConnect(MqttCodec.Packet(MqttCodec.Connect, 0, b))
    }
    // truncations of a VALID publish: every prefix parses or returns null
    val (valid, flags) = MqttCodec.publishBody("sensors/dd",
      "payload".getBytes("UTF-8"), qos = 1, packetId = 7, dup = false)
    (0 to valid.length).foreach { n =>
      MqttCodec.parsePublish(MqttCodec.Packet(MqttCodec.Publish, flags, valid.take(n)))
    }
    assert(MqttCodec.parsePublish(
      MqttCodec.Packet(MqttCodec.Publish, flags, valid)) != null)
    // declared topic length overrunning the body must be null, not AIOOBE
    assert(MqttCodec.parsePublish(MqttCodec.Packet(MqttCodec.Publish, 0,
      Array[Byte](0x7F, 0x7F, 'a'))) == null)
    // both QoS bits set is malformed per [MQTT-3.3.1-4]: refuse (drop the
    // line), never route-and-ack a protocol violation
    assert(MqttCodec.parsePublish(
      MqttCodec.Packet(MqttCodec.Publish, 0x06, valid)) == null)
  }

  test("TLS end-to-end: wire client and broker stub over SSL with a " +
    "test-generated self-signed keypair, endpoint identification ON") {
    // the reference's mosquitto listens on TLS :8883; the container has
    // no CA material, so the test GENERATES a keypair (keytool ships in
    // the JDK) with SAN=IP:127.0.0.1 and pins it as both the broker's
    // key and the client's trust anchor — full handshake, certificate
    // verification, and hostname (endpoint) identification, over the
    // byte-identical codec/session logic
    val dir = java.nio.file.Files.createTempDirectory("mqtt_tls")
    val ks = dir.resolve("broker.p12")
    val keytool = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "keytool").toString
    import scala.sys.process._
    val rc = Seq(keytool, "-genkeypair", "-alias", "broker", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "1", "-storepass", "changeit",
      "-keypass", "changeit", "-dname", "CN=127.0.0.1",
      "-ext", "SAN=IP:127.0.0.1",
      "-keystore", ks.toString, "-storetype", "PKCS12").!
    assert(rc == 0, "keytool keypair generation failed")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(ks)
    try store.load(in, "changeit".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store) // the self-signed cert IS the pinned trust anchor
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)

    val broker = new MqttBrokerStub(
      serverSocketFactory = p => ctx.getServerSocketFactory.createServerSocket(p))
    def tlsSocket(h: String, p: Int): java.net.Socket = {
      // connect with the SAME 10 s timeout as the client's default plain
      // factory — an unconnected createSocket + bounded connect, so a
      // wedged listener fails the assertion instead of hanging the suite
      val s = ctx.getSocketFactory.createSocket()
        .asInstanceOf[javax.net.ssl.SSLSocket]
      s.connect(new java.net.InetSocketAddress(h, p), 10000)
      // HTTPS-style endpoint identification: the cert's SAN must match
      // the host we dialed — the production posture, not trust-blindly
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(params)
      s
    }
    try {
      val got = new java.util.concurrent.LinkedBlockingQueue[String]()
      val sub = new MqttWireClient("127.0.0.1", broker.port, "tls-sub",
        socketFactory = tlsSocket)
      val subscribed = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => {
        sub.connect()
        sub.subscribeLoop("t/tls", onSubscribed = () => subscribed.countDown()) {
          (_, payload) => got.put(new String(payload, "UTF-8"))
        }
      })
      t.setDaemon(true); t.start()
      assert(subscribed.await(15, java.util.concurrent.TimeUnit.SECONDS),
        "TLS subscriber did not complete its handshake + SUBACK")
      val pub = new MqttWireClient("127.0.0.1", broker.port, "tls-pub",
        socketFactory = tlsSocket)
      pub.connect()
      pub.publish("t/tls", "over-tls".getBytes("UTF-8"))
      pub.close()
      val msg = got.poll(15, java.util.concurrent.TimeUnit.SECONDS)
      assert(msg == "over-tls", s"TLS round trip delivered '$msg'")
      sub.close(); t.join(5000)
    } finally {
      broker.close()
      java.nio.file.Files.deleteIfExists(ks)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("broker stub survives a garbage-spewing client and keeps serving") {
    val broker = new MqttBrokerStub()
    try {
      // hostile line: valid CONNECT, then a torn SUBSCRIBE whose filter
      // length overruns the packet — the stub must drop THIS line only
      val s = new java.net.Socket("127.0.0.1", broker.port)
      val out = new java.io.DataOutputStream(s.getOutputStream)
      MqttCodec.writePacket(out, MqttCodec.Connect, 0,
        MqttCodec.connectBody("evil", cleanSession = true, keepAliveSecs = 0))
      new java.io.DataInputStream(s.getInputStream).readNBytes(4) // CONNACK
      MqttCodec.writePacket(out, MqttCodec.Subscribe, 0x02,
        Array[Byte](0, 1, 0x7F, 0x7F, 'a'))
      // the stub closes the hostile line; a well-behaved session must
      // still connect, subscribe, and publish end-to-end afterwards
      val ok = new MqttWireClient("127.0.0.1", broker.port, "polite")
      ok.connect()
      ok.publish("t/ok", "fine".getBytes("UTF-8"))
      ok.close()
      s.close()
      assert(broker.published.get() == 1)
    } finally broker.close()
  }

  test("QoS 2 publish: four-way handshake completes; a DUP redelivery of an " +
    "in-flight packet id is NOT re-routed (exactly-once at the broker)") {
    val broker = new MqttBrokerStub()
    try {
      // subscriber counts actual deliveries
      val got = new java.util.concurrent.LinkedBlockingQueue[String]()
      val sub = new MqttWireClient("127.0.0.1", broker.port, "q2-sub")
      val subscribed = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => {
        sub.connect()
        sub.subscribeLoop("t/q2", onSubscribed = () => subscribed.countDown()) {
          (_, p) => got.put(new String(p, "UTF-8"))
        }
      })
      t.setDaemon(true); t.start()
      assert(subscribed.await(15, java.util.concurrent.TimeUnit.SECONDS))

      // the happy path through the client API: PUBLISH→PUBREC→PUBREL→PUBCOMP
      val pub = new MqttWireClient("127.0.0.1", broker.port, "q2-pub")
      pub.connect()
      pub.publish("t/q2", "exactly-once".getBytes("UTF-8"), qos = 2)
      pub.close()
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "exactly-once")
      assert(broker.publishedQos2.get() == 1)

      // the redelivery path, driven at the packet level: a sender that
      // never saw PUBREC retransmits PUBLISH with DUP and the SAME packet
      // id (spec §4.3.3) — the broker must answer PUBREC both times but
      // route only once
      val s = new java.net.Socket("127.0.0.1", broker.port)
      val out = new java.io.DataOutputStream(s.getOutputStream)
      val in = new java.io.DataInputStream(s.getInputStream)
      MqttCodec.writePacket(out, MqttCodec.Connect, 0,
        MqttCodec.connectBody("q2-raw", cleanSession = true, keepAliveSecs = 0))
      assert(MqttCodec.readPacket(in).ptype == MqttCodec.Connack)
      val (body, flags) = MqttCodec.publishBody("t/q2",
        "dup-once".getBytes("UTF-8"), qos = 2, packetId = 7, dup = false)
      MqttCodec.writePacket(out, MqttCodec.Publish, flags, body)
      val rec1 = MqttCodec.readPacket(in)
      assert(rec1.ptype == MqttCodec.Pubrec && MqttCodec.ackPacketId(rec1) == 7)
      val (bodyDup, flagsDup) = MqttCodec.publishBody("t/q2",
        "dup-once".getBytes("UTF-8"), qos = 2, packetId = 7, dup = true)
      MqttCodec.writePacket(out, MqttCodec.Publish, flagsDup, bodyDup)
      val rec2 = MqttCodec.readPacket(in)
      assert(rec2.ptype == MqttCodec.Pubrec && MqttCodec.ackPacketId(rec2) == 7)
      MqttCodec.writePacket(out, MqttCodec.Pubrel, 0x02, MqttCodec.u16(7))
      val comp = MqttCodec.readPacket(in)
      assert(comp.ptype == MqttCodec.Pubcomp && MqttCodec.ackPacketId(comp) == 7)
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "dup-once")
      // no second delivery and no second route: exactly one message
      assert(got.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "DUP redelivery was routed twice")
      assert(broker.publishedQos2.get() == 2)
      // the dedup applies ONLY to DUP retransmissions: a NON-dup PUBLISH
      // reusing an in-flight id is a new message from a state-lost sender
      // and must be routed, never silently swallowed while acked
      val (b9, f9) = MqttCodec.publishBody("t/q2",
        "fresh-9".getBytes("UTF-8"), qos = 2, packetId = 9, dup = false)
      MqttCodec.writePacket(out, MqttCodec.Publish, f9, b9) // pid 9 in flight
      assert(MqttCodec.readPacket(in).ptype == MqttCodec.Pubrec)
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "fresh-9")
      val (b9b, f9b) = MqttCodec.publishBody("t/q2",
        "fresh-9-again".getBytes("UTF-8"), qos = 2, packetId = 9, dup = false)
      MqttCodec.writePacket(out, MqttCodec.Publish, f9b, b9b)
      assert(MqttCodec.readPacket(in).ptype == MqttCodec.Pubrec)
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "fresh-9-again",
        "non-DUP publish with an in-flight id was swallowed")
      s.close()
      assert(broker.publishedQos2.get() == 4)
      sub.close(); t.join(5000)
    } finally broker.close()
  }

  test("QoS 2 mid-handshake disconnect: a resumed session (clean session off) " +
    "completes the delivery exactly once, on both sides of PUBREC") {
    val broker = new MqttBrokerStub()
    try {
      val got = new java.util.concurrent.LinkedBlockingQueue[String]()
      val sub = new MqttWireClient("127.0.0.1", broker.port, "q2c-sub")
      val subscribed = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => {
        sub.connect()
        sub.subscribeLoop("t/q2crash", onSubscribed = () => subscribed.countDown()) {
          (_, p) => got.put(new String(p, "UTF-8"))
        }
      })
      t.setDaemon(true); t.start()
      assert(subscribed.await(15, java.util.concurrent.TimeUnit.SECONDS))

      // crash BEFORE PUBREC: the broker routed and holds the packet id,
      // but the sender never saw PUBREC — on resume it retransmits
      // PUBLISH+DUP; the persistent session's dedup state must swallow it
      val pub = new MqttWireClient("127.0.0.1", broker.port, "q2c-pub",
        cleanSession = false)
      pub.connect()
      broker.dropBeforeNextPubrec = true
      intercept[java.io.IOException] {
        pub.publish("t/q2crash", "crash-a".getBytes("UTF-8"), qos = 2)
      }
      pub.connect() // reconnect resumes: PUBLISH(DUP) -> PUBREC -> PUBREL -> PUBCOMP
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "crash-a")
      assert(got.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "pre-PUBREC crash delivered twice")
      assert(broker.publishedQos2.get() == 1)

      // crash AFTER PUBREC: the sender owes only PUBREL — resume must NOT
      // retransmit the PUBLISH (that could double-route under a broker
      // that had released the id), just finish the release handshake
      broker.dropAfterNextPubrec = true
      try pub.publish("t/q2crash", "crash-b".getBytes("UTF-8"), qos = 2)
      catch { case _: java.io.IOException => pub.connect() }
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "crash-b")
      assert(got.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "post-PUBREC crash delivered twice")
      assert(broker.publishedQos2.get() == 2)
      pub.close(); sub.close(); t.join(5000)
    } finally broker.close()
  }

  test("client-id takeover (§3.1.4): a second CONNECT with the same id disconnects " +
    "the first, the survivor serves, and the loser's teardown cannot wipe QoS 2 state") {
    val broker = new MqttBrokerStub()
    try {
      val got = new java.util.concurrent.LinkedBlockingQueue[String]()
      val sub = new MqttWireClient("127.0.0.1", broker.port, "tk-sub")
      val subscribed = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => {
        sub.connect()
        sub.subscribeLoop("t/takeover", onSubscribed = () => subscribed.countDown()) {
          (_, p) => got.put(new String(p, "UTF-8"))
        }
      })
      t.setDaemon(true); t.start()
      assert(subscribed.await(15, java.util.concurrent.TimeUnit.SECONDS))

      // first holder of the id (clean session — its teardown would wipe
      // "tk"'s QoS 2 state IF it still owned the id at teardown time)
      val c1 = new MqttWireClient("127.0.0.1", broker.port, "tk")
      c1.connect()
      c1.publish("t/takeover", "from-c1".getBytes("UTF-8"), qos = 1)
      assert(got.poll(15, java.util.concurrent.TimeUnit.SECONDS) == "from-c1")

      // takeover: same clientId, persistent session this time
      val c2 = new MqttWireClient("127.0.0.1", broker.port, "tk",
        cleanSession = false)
      c2.connect()
      // the broker MUST have disconnected c1: its next round-trip dies.
      // Poll briefly — the close lands asynchronously on c1's serve thread
      val c1Dead = (0 until 50).exists { _ =>
        try { c1.publish("t/takeover", "zombie".getBytes("UTF-8"), qos = 1); Thread.sleep(100); false }
        catch { case _: java.io.IOException => true }
      }
      assert(c1Dead, "first connection must be disconnected by the takeover")

      // the survivor serves — and the taken-over session's (clean)
      // teardown must NOT have wiped the QoS 2 dedup state c2 now uses:
      // crash mid-handshake, resume, exactly-once must still hold
      broker.dropBeforeNextPubrec = true
      intercept[java.io.IOException] {
        c2.publish("t/takeover", "tk-msg".getBytes("UTF-8"), qos = 2)
      }
      c2.connect() // reconnect (a self-takeover of the dead socket)
      // the c1-death poll above publishes zombies until the socket dies;
      // under load one can be ROUTED before the takeover disconnect
      // lands on c1's serve path — skip those (they are legal QoS 1
      // deliveries from before the takeover), the message under test is
      // tk-msg and the residue check below still proves exactly-once
      val first = Iterator.continually(
        got.poll(15, java.util.concurrent.TimeUnit.SECONDS))
        .dropWhile(_ == "zombie").next()
      assert(first == "tk-msg", s"expected tk-msg, got $first")
      // drain any zombie deliveries c1 landed before its death, then
      // assert no DUPLICATE of tk-msg arrived (exactly-once held)
      val residue = Iterator.continually(
        got.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS))
        .takeWhile(_ != null).toSeq
      assert(!residue.contains("tk-msg"), s"takeover broke exactly-once: $residue")
      c1.close(); c2.close(); sub.close(); t.join(5000)
    } finally broker.close()
  }

  test("QoS 2 subscriber: maxQos 2 grant delivers exactly once to the handler " +
    "through PUBREC/PUBREL/PUBCOMP") {
    val broker = new MqttBrokerStub()
    try {
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      val sub = new MqttWireClient("127.0.0.1", broker.port, "q2s-sub")
      val subscribed = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => {
        sub.connect()
        sub.subscribeLoop("t/q2sub", onSubscribed = () => subscribed.countDown(),
          maxQos = 2) { (_, p) =>
          counts.merge(new String(p, "UTF-8"), 1, (a, b) => a + b)
        }
      })
      t.setDaemon(true); t.start()
      assert(subscribed.await(15, java.util.concurrent.TimeUnit.SECONDS))
      val pub = new MqttWireClient("127.0.0.1", broker.port, "q2s-pub")
      pub.connect()
      (0 until 8).foreach(i =>
        pub.publish("t/q2sub", s"m$i".getBytes("UTF-8"), qos = 2))
      pub.close()
      val deadline = System.currentTimeMillis() + 15000
      while (counts.size < 8 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(counts.size == 8, s"delivered ${counts.size}/8 distinct messages")
      assert(counts.values.asScala.forall(_ == 1),
        s"some message delivered more than once: $counts")
      sub.close(); t.join(5000)
    } finally broker.close()
  }

  test("bridge reconnects with backoff after a broker restart: re-subscribes, " +
    "ingest resumes, spool seqs stay dense") {
    val spool = java.nio.file.Files.createTempDirectory("mqtt_reconnect").toString
    val broker1 = new MqttBrokerStub()
    val port = broker1.port
    val bridge = new MqttSpoolBridge("127.0.0.1", port, spool, "t/rec")
    try {
      bridge.awaitSubscribed()
      val pub1 = new MqttWireClient("127.0.0.1", port, "rec-pub-1")
      pub1.connect()
      pub1.publish("t/rec", "before-restart".getBytes("UTF-8"))
      pub1.close()
      val d1 = System.currentTimeMillis() + 15000
      while (bridge.received.get() < 1 && System.currentTimeMillis() < d1)
        Thread.sleep(20)
      assert(bridge.received.get() == 1)

      // broker dies mid-stream; the bridge must stay ALIVE (retrying),
      // not record a terminal failure
      broker1.close()
      Thread.sleep(200)
      assert(bridge.isAlive, "bridge treated a broker outage as terminal")
      assert(bridge.failure.isEmpty)

      // broker returns ON THE SAME PORT; the bridge's backoff loop must
      // reconnect and re-subscribe on its own (the reference's
      // subscribe-in-on_connect pattern, dd/consumer.cpp:70-76). The
      // rebind can transiently lose to the dying listener — retry it.
      def rebind(attempt: Int = 0): MqttBrokerStub =
        try new MqttBrokerStub(port)
        catch { case _: java.net.BindException if attempt < 50 =>
          Thread.sleep(100); rebind(attempt + 1)
        }
      val broker2 = rebind()
      try {
        val d2 = System.currentTimeMillis() + 20000
        while (bridge.subscribeCount.get() < 2 && System.currentTimeMillis() < d2)
          Thread.sleep(20)
        assert(bridge.subscribeCount.get() >= 2,
          "bridge did not re-subscribe after broker restart")
        val pub2 = new MqttWireClient("127.0.0.1", port, "rec-pub-2")
        pub2.connect()
        pub2.publish("t/rec", "after-restart".getBytes("UTF-8"))
        pub2.close()
        val d3 = System.currentTimeMillis() + 15000
        while (bridge.received.get() < 2 && System.currentTimeMillis() < d3)
          Thread.sleep(20)
        assert(bridge.received.get() == 2, "ingest did not resume after restart")
        // the spool contract is unbroken across the outage: dense seqs,
        // both messages durable, in order
        val dir = java.nio.file.Paths.get(spool, "t_rec")
        val seqs = MqttLike.listSeqs(dir)
        assert(seqs == (0L until 2L), s"spool seqs not dense after restart: $seqs")
        assert(seqs.map(s => java.nio.file.Files.readString(dir.resolve(s"$s.msg"))) ==
          Seq("before-restart", "after-restart"))
      } finally broker2.close()
    } finally { bridge.close(); broker1.close() }
  }

  test("keepalive: an idle client outlives its declared keepalive window " +
    "(PINGREQ fires from the timer; the pong is absorbed by the next ack wait)") {
    val broker = new MqttBrokerStub()
    try {
      val c = new MqttWireClient("127.0.0.1", broker.port, "ka-client",
        keepAliveSecs = 1)
      c.connect()
      Thread.sleep(2500) // > 2 keepalive periods idle: pings must have fired
      c.publish("t/ka", "still-here".getBytes("UTF-8")) // PUBACK round-trips
      c.close()
      assert(broker.published.get() == 1)
    } finally broker.close()
  }

  test("soak: concurrent QoS 0/1/2 producers across broker kills — spool seqs " +
    "stay dense, every acked QoS 1/2 message survives, duplicates are bounded") {
    // The r13-new wire machinery (QoS 2 four-way handshake, reconnect
    // backoff, keepalive pinger) is concurrency-heavy; this soak runs all
    // of it AT ONCE: three producers at QoS 0/1/2 (the QoS 0 one with a
    // 1 s keepalive so PINGREQs interleave the publishes), the broker
    // killed and rebound twice mid-stream, the bridge reconnecting on its
    // own. Invariants at the end are the spool contract under honest MQTT
    // semantics: dense seqs; every ACKED QoS 1/2 message present (a gate
    // keeps producers from publishing into the no-subscriber window after
    // a broker rebirth, where even QoS 2 acks route to nobody); duplicate
    // copies bounded by the at-least-once budget (QoS 1 retries + QoS 2
    // handshakes that straddled a broker death, whose packet-id dedup
    // state died with the incarnation); QoS 0 spool content a subset of
    // what was sent. Reference contract: mqtt.c:49-97.
    val spool = java.nio.file.Files.createTempDirectory("mqtt_soak").toString
    @volatile var broker = new MqttBrokerStub()
    val port = broker.port
    val bridge = new MqttSpoolBridge("127.0.0.1", port, spool, "t/soak")
    val gate = new java.util.concurrent.atomic.AtomicBoolean(false)
    val halt = new java.util.concurrent.atomic.AtomicBoolean(false)
    val restarts = 2

    final class Soaker(val qos: Int, id: String) extends Thread(s"soak-$id") {
      val acked = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val sentQos0 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      @volatile var retries = 0 // re-publishes of an already-attempted message
      private val client = new MqttWireClient("127.0.0.1", port, s"soak-$id",
        cleanSession = false, keepAliveSecs = if (qos == 0) 1 else 0)
      override def run(): Unit = {
        var i = 0
        var connected = false
        var attempted = false // current message already hit publish() once
        while (!halt.get()) {
          if (!gate.get()) { connected = false; Thread.sleep(10) }
          else {
            val msg = s"m$qos-$id-$i"
            try {
              // connect() resumes any QoS 2 handshake the last death
              // interrupted (delivering that message); the re-publish
              // below is then a DUPLICATE by design — counted in retries
              // and covered by the soak's bounded-dup budget
              if (!connected) { client.connect(); connected = true }
              if (attempted) retries += 1
              if (qos == 0) sentQos0.add(msg)
              attempted = true
              client.publish("t/soak", msg.getBytes("UTF-8"), qos)
              if (qos > 0) acked.add(msg)
              attempted = false
              i += 1
              // throttle: an unthrottled QoS 0 loop fires ~60k msg/s on
              // loopback, leaving the bridge a minutes-deep TCP backlog
              // the post-soak drain can never quiesce inside the budget
              Thread.sleep(2)
            } catch {
              case _: java.io.IOException | _: RuntimeException =>
                connected = false
                if (qos == 0) { attempted = false; i += 1 } // fire-and-forget
                Thread.sleep(10)
            }
          }
        }
        client.close()
      }
    }

    val producers = Seq(new Soaker(0, "p0"), new Soaker(1, "p1"), new Soaker(2, "p2"))
    try {
      bridge.awaitSubscribed()
      producers.foreach(_.start())
      gate.set(true)

      def rebind(attempt: Int = 0): MqttBrokerStub =
        try new MqttBrokerStub(port)
        catch { case _: java.net.BindException if attempt < 50 =>
          Thread.sleep(100); rebind(attempt + 1)
        }
      (1 to restarts).foreach { r =>
        Thread.sleep(900) // let the producers hammer this incarnation
        gate.set(false)
        Thread.sleep(150) // drain in-flight handshakes the gate let through
        broker.close()
        Thread.sleep(150)
        broker = rebind()
        // producers stay gated until the bridge has RE-SUBSCRIBED: a
        // broker acks a publish with zero subscribers, so opening the
        // gate earlier would leak acked-but-routed-to-nobody messages
        val d = System.currentTimeMillis() + 20000
        while (bridge.subscribeCount.get() < r + 1 && System.currentTimeMillis() < d)
          Thread.sleep(20)
        assert(bridge.subscribeCount.get() >= r + 1,
          s"bridge did not re-subscribe after restart $r")
        gate.set(true)
      }
      Thread.sleep(900)
      halt.set(true)
      producers.foreach(_.join(15000))
      assert(producers.forall(!_.isAlive), "a producer thread wedged")
      // drain: routed messages land in the spool asynchronously — the
      // spool must be QUIET (two consecutive unchanged polls) before the
      // invariants read it, else listSeqs races the bridge's claim/promote
      // and reports phantom gaps
      var last = -1L
      var quiet = 0
      val d = System.currentTimeMillis() + 15000
      while (quiet < 2 && System.currentTimeMillis() < d) {
        Thread.sleep(300)
        val r = bridge.received.get()
        if (r == last) quiet += 1 else { quiet = 0; last = r }
      }
      assert(quiet >= 2, "bridge never quiesced after producers stopped")
      assert(bridge.isAlive && bridge.failure.isEmpty,
        s"bridge unhealthy after soak: ${bridge.failure}")

      val dir = java.nio.file.Paths.get(spool, "t_soak")
      val seqs = MqttLike.listSeqs(dir)
      assert(seqs == (0L until seqs.size), s"spool seqs not dense: $seqs")
      val spooled = seqs.map(s => java.nio.file.Files.readString(dir.resolve(s"$s.msg")))
      val counts = spooled.groupBy(identity).view.mapValues(_.size).toMap
      import scala.jdk.CollectionConverters._
      // enough traffic that the soak actually soaked
      val ackedAll = producers.filter(_.qos > 0).flatMap(_.acked.asScala.toSeq)
      assert(ackedAll.size > 50, s"soak produced too little traffic: ${ackedAll.size}")
      // zero-loss: every acked QoS 1/2 message reached the spool
      val lost = ackedAll.filterNot(counts.contains)
      assert(lost.isEmpty, s"acked messages missing from spool: ${lost.take(5)}")
      // bounded dups: extra copies only from counted re-publishes and
      // handshakes straddling a broker death (one per producer-restart)
      val extraCopies = counts.valuesIterator.map(_ - 1).sum
      val budget = producers.map(_.retries).sum + restarts * producers.size
      assert(extraCopies <= budget,
        s"$extraCopies duplicate copies exceed the at-least-once budget $budget")
      // QoS 0 messages in the spool are a subset of what was sent; nothing
      // foreign or corrupt ever landed
      val sent0 = producers.flatMap(_.sentQos0.asScala.toSeq).toSet
      val spooled0 = spooled.filter(_.startsWith("m0-"))
      assert(spooled0.forall(sent0.contains), "spool holds a QoS 0 payload never sent")
      assert(spooled.forall(_.matches("m[0-2]-p[0-2]-\\d+")),
        "spool holds a corrupt payload")
    } finally {
      halt.set(true); gate.set(false)
      producers.foreach(_.join(2000))
      bridge.close(); broker.close()
    }
  }

  test("wire-mode sink refuses malformed mqtt:// targets and QoS 3 loudly") {
    // QoS beyond the spec's 0/1/2 is refused at open(); qos = 2 is now a
    // REAL wire mode (the four-way handshake — see the QoS 2 tests)
    val w3 = new Sinks.MqttLikePublishWriter("mqtt://127.0.0.1:1883", "t/x", qos = 3)
    val e3 = intercept[IllegalArgumentException] { w3.open(0L, 0L) }
    assert(e3.getMessage.contains("0, 1 or 2"), e3.getMessage)
    // empty port must hit the descriptive require, not a bare
    // NumberFormatException from "".toInt
    val wEmpty = new Sinks.MqttLikePublishWriter("mqtt://10.0.0.5:", "t/x", qos = 1)
    val eEmpty = intercept[IllegalArgumentException] { wEmpty.open(0L, 0L) }
    assert(eEmpty.getMessage.contains("mqtt://host:port"), eEmpty.getMessage)
    // bracketless IPv6: the rightmost-colon split leaves a non-numeric
    // port or empty host — descriptive refusal either way
    val w6 = new Sinks.MqttLikePublishWriter("mqtt://::1", "t/x", qos = 1)
    val e6 = intercept[IllegalArgumentException] { w6.open(0L, 0L) }
    assert(e6.getMessage.contains("mqtt://host:port"), e6.getMessage)
  }
}
