package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per round at sf0.1 (BASELINE.md).
  *
  * Each registered query is fully materialized through the `noop` sink:
  * a bare `.count()` would let Catalyst prune every projected column and
  * benchmark only the scan. One warmup query first so JIT/codegen costs
  * don't land on the first measured query.
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports
  * the per-query MEDIAN: single-shot numbers on this box carry ±0.8 s
  * run-to-run noise (BENCH_r01 vs r02 showed ±30% per-query swings with
  * zero code change), which masquerades as regression. The cache is
  * cleared between reps so a query's persist() fills don't turn later
  * reps into cache reads.
  */
object Bench {

  /** stdout keys each query by its unique id prefix — see the tail-window
    * comment in main; uniqueness is guarded in InvariantsSpec. From 165
    * registrations the constant leading 'q' is stripped too ("01",
    * "e13b"): every name carries it, so it spent one budget char per
    * query saying nothing, and dropping it bought ~15 registrations of
    * headroom the cap-and-retire ladder (min map cap 6 → 2 → gone) had
    * exhausted. bench_out.json keys by FULL name as always. */
  val shortKey: String => String = n => n.takeWhile(_ != '_').stripPrefix("q")

  /** Locale-pinned formatters: the default-locale f"%.1f" would print
    * "0,1" on a comma-decimal locale (de_DE), breaking the JSON. stdout
    * uses DECIsecond precision, dropping to whole seconds at >= 10 (a
    * 10+-second query's decisecond is inside the recorded ambient spread
    * band, and the shorter worst-case width is what keeps a 145+-query
    * line inside the driver's 2000-char tail window — guarded in
    * InvariantsSpec); bench_out.json keeps full precision and is the
    * authoritative record. */
  val deci: Double => String = v =>
    if (v >= 9.95) "%.0f".formatLocal(java.util.Locale.ROOT, v)
    else "%.1f".formatLocal(java.util.Locale.ROOT, v)

  /** Render the one-line JSON metric — factored out so InvariantsSpec can
    * assert the exact line main prints PARSES as JSON, sums correctly, and
    * fits the driver's tail window. `extra` lands before the closing brace
    * (the file form appends reps + per-query spread). */
  /** JSON string escape (backslash, quote, control chars) — the `sf`
    * value comes from an env var, and an unescaped quote/backslash in it
    * would make the whole line (and bench_out.json) unparseable, silently
    * zeroing the round's bench. Same escaper Verify uses for oracle SQL. */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  // The inflated-min stdout map (r12 verdict #2, capped at 6 then 2
  // entries) was retired at 164 registrations: the tail-window budget it
  // rode on is spent, exactly as its own comment predicted at 161. The
  // hot-host self-diagnosis lives on in bench_out.json, which has always
  // carried EVERY query's min at full precision plus per-query 1-min
  // load samples — the stdout map was a capped preview of that record,
  // never the record itself.

  /** Per-query violation band on the per-query MIN (r14 verdict #2: a 9×
    * single-query anomaly hid inside a passing 1.65× total — a regression
    * must be a machine diff, not a judge's spreadsheet). Bands encode
    * BASELINE.md's family table with headroom above every per-family
    * driver-measured max-min of the r14 sweep (the hottest honest read on
    * record), so an entry in `violations` means "outside anything ambient
    * load has ever explained", not "a noisy median". The MIN is judged,
    * never the median: medians inflate under ambient load (the documented
    * 1.19–1.35× day-part drift) while the min of 3 reps survives it. */
  def bandHi(name: String): Double = {
    val id = name.takeWhile(_ != '_')
    if (!id.startsWith("qe")) 2.5 // parity/relational (q26 top: 1.77 driver)
    // ANY certificate rides the certificate band regardless of its id
    // family — certificates run extra claim paths by design (qe3f runs
    // TWO full probe/top-k searches plus the equality join; pricing it
    // against the single-search ANN band would false-positive)
    else if (name.contains("_cert_")) 12.0
    else {
      val core = id.drop(2)
      val num = core.takeWhile(_.isDigit) match {
        case "" => -1
        case ds => ds.toInt
      }
      val exactForm = core.forall(_.isDigit) // no letter suffix
      if (num == 5 || num == 59) 1.5 // multimodal byte-parsers
      else if (num >= 60 && num <= 66) 12.0 // certificates (widest plans; qe60 min 8.4 seen under r15 ambient)
      else if (num >= 67 && num <= 76) 6.0 // media/crawl dedup (real decode; qe71 min 5.1 under a load-7.5 slot, r15)
      else if (exactForm && Set(2, 46, 50, 55, 58).contains(num)) 6.0 // exact anchors (qe55 min 4.8 under r15 ambient)
      else if (num == 3 || num == 7) 4.5 // ANN ladder + embed dedup (qe7c min 3.61 observed under a load-6.6 slot, r15 sweep 1)
      else if (Set(1, 2, 10, 11, 12, 13, 21, 42, 43, 52).contains(num)) 5.0 // dedup/LSH (incl. qe2b/qe2c twins)
      // capstones (qe33/qe40/qe44) ride the default band since the r17
      // recalibration (r16 verdict #3): their dedicated 2.5 — set on the
      // lighter qe33/qe40 shapes — produced a false marginal on qe44's
      // r16 driver read (min 2.80, pure ambient telemetry signature,
      // quiet-host 1.33); 3.5 = 2.80 x 1.25 equals the default, so the
      // branch is gone rather than left as a dead distinction. Every
      // other family audited in-place: already at instrumented max-min x
      // ~1.25 (audit table in BASELINE.md r17).
      else 3.5 // text analysis / retrieval / capstones / remaining extensions
    }
  }

  /** The host-saturation canary threshold on q01_project's min (seconds).
    * q01 is a pure codegen projection whose warm min has never exceeded
    * 0.56 s on any recorded HEALTHY sweep (r14 driver incl. the qe62
    * anomaly: 0.56; r15 sweeps 1–3: 0.43–0.55); the r15 saturated sweep
    * measured it at 2.76 s while its 1-minute load SAMPLE still read 1.3
    * — the load average lags the contention, so the canary is the only
    * in-band signal that the sweep's own reps ran on a saturated host. */
  val CanaryQuery = "q01_project"
  val CanaryMax = 1.0

  /** Hard-violation multiplier over the band: across six r15 sweeps
    * (ambient load 1→7.5) every ambient-caused band crossing stayed
    * within 1.15× its band (qe44 2.85/2.5, qe50 6.15/6.0, qe55 6.22/6.0
    * on the sweep whose saturation arrived AFTER a healthy canary),
    * while the r14 qe62 anomaly sat at 2.35× (28.2 vs 12). 1.25 splits
    * them with margin on both sides. */
  val HardViolationFactor = 1.25

  /** Violation gate (r15): split band crossings three ways —
    * HARD (min > 1.25× band on a canary-healthy sweep: the multiple-×
    * r14-qe62 class, always actionable), MARGINAL (band < min ≤ 1.25×
    * band: at the band's edge, the shape mid-sweep ambient produces —
    * read with the load map / min-sum context), and SUPPRESSED (the q01
    * canary shows the host was saturated from the sweep's start, so no
    * per-query min is a calibrated read). All three land in
    * bench_out.json — data is annotated, never discarded. Returns
    * (canary min, hard, marginal, suppressed).
    *
    * A MISSING canary (partial SPARK_GRAFT_BENCH_ONLY run that skipped
    * q01, or q01 itself crashed and recorded -1) is canary-UNKNOWN, not
    * canary-healthy: without the saturation read, no crossing can be
    * certified as a hard anomaly, so every crossing routes to the
    * suppressed tier and canary min reports -1.0 — the artifact then
    * says "unjudgeable sweep", never "healthy with hard violations"
    * (ADVICE r15: the old getOrElse(0.0) default silently passed the
    * health gate). */
  def violationGate(mins: Seq[(String, Double)])
      : (Double, Seq[(String, Double)], Seq[(String, Double)], Seq[(String, Double)]) = {
    val canary = mins.toMap.get(CanaryQuery).filter(_ >= 0)
    val raw = mins.filter { case (n, v) => v >= 0 && v > bandHi(n) }
    canary match {
      case None => (-1.0, Seq.empty, Seq.empty, raw)
      case Some(c) if c > CanaryMax => (c, Seq.empty, Seq.empty, raw)
      case Some(c) =>
        val (hard, marginal) = raw.partition { case (n, v) =>
          v > HardViolationFactor * bandHi(n) }
        (c, hard, marginal, Seq.empty)
    }
  }

  /** Per-task metric accumulator (r15 verdict #1): shuffle read/write
    * bytes and memory+disk spill, summed across every task the sweep
    * runs. Listener events post asynchronously on the listener bus, so a
    * query's last task-end rows can land a beat after its clock stops —
    * adjacent-query bleed of one task's bytes is accepted measurement
    * noise (the sweep is serial and the signal sought is a 10× premium,
    * not a kilobyte). */
  private class TaskTelemetryListener extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val spill = new AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def snapshot: (Long, Long, Long) =
      (shuffleRead.get, shuffleWrite.get, spill.get)
  }

  /** Bytes on disk under THIS JVM's Spark scratch roots (the block
    * manager's own local dirs: shuffle files + localCheckpoint disk
    * blocks) — the direct measure of the r15 verdict #2 "is scratch ever
    * pruned mid-sweep" question. Roots come from the live SparkEnv via
    * [[org.apache.spark.graftshim.SparkEnvShim]], never a tmpdir glob: a
    * pattern scan over java.io.tmpdir would fold every CONCURRENT Spark
    * process's churn into this sweep's per-query ledger (review r16).
    * Walk failures (a file the cleaner deletes mid-walk) are skipped,
    * never thrown. */
  def localDirBytes(): Long = {
    import java.nio.file._
    var total = 0L
    org.apache.spark.graftshim.SparkEnvShim.localDirs.foreach { root =>
      try Files.walkFileTree(root.toPath, new SimpleFileVisitor[Path] {
        override def visitFile(f: Path, a: attribute.BasicFileAttributes): FileVisitResult = {
          total += a.size(); FileVisitResult.CONTINUE
        }
        override def visitFileFailed(f: Path, e: java.io.IOException): FileVisitResult =
          FileVisitResult.CONTINUE
      }) catch { case _: Exception => }
    }
    total
  }

  /** The in-sweep attribution trigger (r15 verdict #1): a query re-runs
    * its stage probes AT ITS OWN SWEEP SLOT iff its min is a HARD band
    * crossing and a probe decomposition is registered for it. Factored
    * out of main so the trigger is machine-checked (InvariantsSpec) —
    * the path fires only on anomalous sweeps, which a healthy session
    * never produces. Fires regardless of the canary: even on a saturated
    * host the at-slot stage split is exactly the evidence wanted, and
    * the violation tiers downstream still classify the sweep. */
  def shouldProbeInSweep(name: String, minSec: Double,
                         hasProbe: String => Boolean): Boolean =
    minSec > HardViolationFactor * bandHi(name) && hasProbe(name)

  /** The one probe the post-sweep reference pass runs by default — the
    * query whose driver-host premium is under adjudication (r14→r16). */
  val DefaultStageRef = "qe62_cert_embed"

  /** Post-sweep stage-probe selection (r16 verdict #6): with the r16
    * in-sweep instrument in place (probes re-run AT a violating query's
    * own slot), running EVERY registered probe post-sweep every sweep
    * double-counts — the artifact carried two full stage maps for qe62
    * on violating sweeps and burned probe time on healthy ones. The
    * post-sweep pass now runs ONE scheduled reference probe (the
    * adjudicated query, keeping a healthy-baseline stage split on every
    * sweep's record); SPARK_GRAFT_BENCH_STAGE_REF widens it (comma
    * prefixes, or "all" for the pre-r17 every-probe pass). */
  def stageRefs(registered: Seq[String], refEnv: Option[String]): Seq[String] = {
    val sorted = registered.sorted
    refEnv match {
      case Some("all") => sorted
      case Some(s) =>
        val ps = s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        sorted.filter(n => ps.exists(n.startsWith))
      case None =>
        if (sorted.contains(DefaultStageRef)) Seq(DefaultStageRef)
        else sorted.take(1)
    }
  }

  /** Sweep-order permutation (r16 verdict #1b): the qe62 driver-host GC
    * premium appears at ~slot 144 of the sorted sweep — whether it
    * follows the SLOT (sweep-accumulated allocation: codegen cache,
    * broadcast cleanup) or the QUERY (the family's own allocation burst)
    * is exactly one permutation run apart. SPARK_GRAFT_BENCH_HOIST moves
    * every query matching a comma-separated prefix list to the FRONT of
    * the sorted order (stable within each part); the artifact records
    * the flag so a hoisted sweep can never be mistaken for a baseline
    * read. */
  def orderNames(sorted: Seq[String], hoist: Option[Seq[String]]): Seq[String] =
    hoist match {
      case None => sorted
      case Some(ps) =>
        val (first, rest) = sorted.partition(n => ps.exists(n.startsWith))
        first ++ rest
    }

  /** True median: even-length inputs average the two middle values —
    * `sorted(n/2)` alone is the UPPER middle, which at reps=2 reports the
    * WORST run as "the median" (a bimodal 1s/28s GC spike would record a
    * 28x regression that never happened). */
  def median(ts: Seq[Double]): Double = {
    val sorted = ts.sorted
    if (sorted.size % 2 == 1) sorted(sorted.size / 2)
    else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
  }

  def renderLine(results: Seq[(String, Double)], sfDir: String,
                 fmt: Double => String, key: String => String,
                 extra: String = "",
                 totalOf: Seq[(String, Double)] = null): String = {
    val qs = results.map { case (k, v) => "\"" + key(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // `totalOf` decouples the reported total from the emitted map: the
    // stdout form may OMIT cheap queries (see stdoutLine) but its total
    // must stay the full sweep's sum, never the kept subset's
    val total = (if (totalOf == null) results else totalOf)
      .map(_._2).filter(_ >= 0).sum
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"${jsonEscape(sfDir)}"$extra}"""
  }

  /** The stdout budget: the driver keeps the LAST 2000 chars of bench
    * stdout and the ~80-char sbt epilogue shares the window — an
    * oversized line loses its HEAD (the `{"metric":"total"` part) and
    * the round's bench silently parses to null. */
  val StdoutBudget = 1880

  /** Tail-window-safe stdout line (r15 verdict #5): at 170 registrations
    * the worst-case full map no longer fits [[StdoutBudget]], so when the
    * rendered line overflows, queries are dropped CHEAPEST-FIRST until it
    * fits — the expensive queries are what a bench reader acts on, the
    * cheap tail is noise at stdout precision, and bench_out.json has
    * always carried every query at full precision. Failed queries (-1)
    * drop LAST — only after every healthy entry is gone (an all-failure
    * sweep's ~170 undroppable rows would otherwise overflow the window
    * and head-truncate the line in exactly the catastrophic case where
    * visibility matters most; review r16) — and `"fail":N` rides the
    * line whenever any query failed, so the failure COUNT survives even
    * when rows had to drop. The reported total is always the FULL
    * sweep's sum and `"omit":N` records how many entries the window hid
    * — silent truncation would read as "covered everything". Fits by
    * construction for any input (the loop can drop every entry). */
  def stdoutLine(results: Seq[(String, Double)], sfShort: String,
                 keyed: String => String, extraFor: Int => String): String = {
    val nFailed = results.count(_._2 < 0)
    val failExtra = if (nFailed > 0) s""","fail":$nFailed""" else ""
    def render(kept: Seq[(String, Double)]): String =
      renderLine(kept, sfShort, deci, keyed,
        extraFor(results.size - kept.size) + failExtra, totalOf = results)
    var kept = results
    var line = render(kept)
    val (failed, healthy) = results.partition(_._2 < 0)
    val dropOrder = (healthy.sortBy(_._2) ++ failed).map(_._1).iterator
    val dropped = collection.mutable.Set.empty[String]
    while (line.length > StdoutBudget && dropOrder.hasNext) {
      dropped += dropOrder.next()
      kept = results.filterNot(r => dropped(r._1))
      line = render(kept)
    }
    line
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Engine.session is the ONE session recipe (AQE + coalescer floor +
    // UTC + nanosAsLong at construction) — a re-implemented config block
    // here had already drifted from it once
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)
    // the per-query reset unpersists localCheckpointed RDDs (see
    // execOnce), and each such unpersist WARNs "lineage has been
    // truncated and cannot be recomputed" — true, intended (nothing is
    // recomputed across queries), and ~170×/sweep of stderr noise; quiet
    // the rdd category only, leaving every other WARN live
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

    def execOnce(name: String): Double = {
      // collect garbage from the previous run so its GC debt is not
      // charged to this one (bimodal 1s->28s spikes observed otherwise).
      // getPersistentRDDs covers what clearCache does NOT: localCheckpoint
      // blocks (MEMORY_AND_DISK) are persistent RDDs outside the SQL
      // cache, and without an explicit unpersist they linger until the
      // async ContextCleaner happens to process them — the r15 verdict #2
      // checkpoint-accumulation suspect. Blocking: the freed blocks must
      // be GONE before this rep's clock starts, not racing it.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // reps run back-to-back deliberately: interleaving them round-robin was
    // tried and inflates every number ~20% — a query's later reps lose
    // their generated-code JIT state to the codegen LRU once 69 other
    // queries' plans pass through, so every rep measures cold. Warm
    // back-to-back medians are also what every prior round recorded.
    // (median, max-min spread, min, fit): spread and min land in
    // bench_out.json so an environmental outlier (the BENCH_r07 94 s vs
    // 69.5/71.4 s episode) is visible in the artifact itself instead of
    // needing a re-run to detect — and under a warming host (r11's load
    // 2.8->7.1 sweep) even the median absorbs ambient; the per-query MIN
    // is the cleanest read this sweep produced (r11 verdict #7). FIT is
    // the Artifacts ledger delta across this query's reps (r13 verdict
    // #1): on a cold store the first rep that touches a key pays its
    // one-time fit, and this column is what separates that from a real
    // apply-path regression — with reps >= 2 the fit charge lands on
    // rep 1 only, so median/min are already the pure-apply read.
    def exec(name: String): (Double, Double, Double, Double) = {
      val f0 = Artifacts.fitNanos.get
      val ts = (1 to reps).map(_ => execOnce(name))
      val fit = (Artifacts.fitNanos.get - f0) / 1e9
      if (ts.exists(_ < 0)) (-1.0, -1.0, -1.0, fit)
      else (median(ts), ts.max - ts.min, ts.min, fit)
    }

    // ambient-host context: the driver box has measured 1.19-1.35x
    // day-part drift on identical code (BASELINE.md) — recording the
    // 1-minute load average at sweep start/end puts the attribution in
    // the artifact instead of in prose
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg

    // warmup: parquet footers + vectorized-reader init for every table,
    // then one full query for JIT/codegen paths
    val t = Engine.Tables(spark, sfDir)
    Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
      t.lineitem, t.events, t.documents, t.embeddings).foreach(_.count())
    execOnce("q01_project") // ONE warmup run (JIT/codegen), not reps of it
    // SPARK_GRAFT_BENCH_ONLY=qe13,qe14 narrows to matching prefixes for
    // fast single-query iteration; unset = the driver's full sweep
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    // SPARK_GRAFT_BENCH_HOIST=qe62 front-loads a family for the
    // slot-vs-query attribution experiment (r16 verdict #1) — see
    // orderNames; recorded in the artifact as "hoist"
    val hoist = sys.env.get("SPARK_GRAFT_BENCH_HOIST")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    val names = orderNames(
      SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.exists(n.startsWith))), hoist)
    // stage-probe runner shared by the post-sweep attribution pass and
    // the r16 IN-SWEEP pass: construction of the probe's shared inputs
    // runs guarded (a probe that cannot construct records a -1 row,
    // never crashes main), each stage under the same clearCache+gc
    // discipline as execOnce so stages don't serve each other's cache
    def timeStages(n: String,
                   mk: (SparkSession, String) => Seq[(String, () => org.apache.spark.sql.DataFrame)])
        : Seq[(String, Double)] = {
      val built =
        try mk(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] stage probe $n failed to construct: ${e.getMessage}")
          Seq("__construct" -> (() => throw e))
        }
      built.map { case (label, thunk) =>
        // SAME reset as execOnce — clearCache alone leaves localCheckpoint
        // blocks (persistent RDDs outside the SQL cache) on disk, and a
        // probe stage that checkpoints would land its retained scratch in
        // the NEXT query's disk_delta baseline, perturbing the very
        // accumulation telemetry the in-sweep probes exist to read
        // (ADVICE r16)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        try {
          thunk().write.format("noop").mode("overwrite").save()
          label -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] stage $n/$label failed: ${e.getMessage}")
          label -> -1.0
        }
      }
    }

    // JVM telemetry hooks (r15 verdict #1): GC-time, task shuffle/spill
    // bytes, scratch-dir footprint — sampled at every query's boundaries
    // so a premium that the wall clock alone cannot localize is
    // attributable from the artifact without a re-run
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis: Long = {
      var t = 0L
      gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime))
      t
    }
    // per-collector split (r16 verdict #1a): "16 s of GC on a 258 MB
    // live heap" is unresolvable from the aggregate — collector + count
    // tells minor-churn (many young collections: allocation-rate
    // pressure) apart from full-heap events (old/concurrent collections:
    // heap-sizing pressure). Classification is by bean NAME ("Young"/
    // "Scavenge"/"Copy" → young; everything else — G1 Old/Concurrent,
    // MarkSweep — old), and the artifact records the live bean names so
    // the split is self-describing on any collector.
    def gcByKind: (Long, Long, Long, Long) = {
      var yms = 0L; var yn = 0L; var oms = 0L; var on = 0L
      gcBeans.forEach { b =>
        val t = math.max(0L, b.getCollectionTime)
        val n = math.max(0L, b.getCollectionCount)
        val name = b.getName
        if (name.contains("Young") || name.contains("Scavenge") ||
          name.contains("Copy")) { yms += t; yn += n }
        else { oms += t; on += n }
      }
      (yms, yn, oms, on)
    }
    val gcNames = {
      val ns = collection.mutable.ArrayBuffer.empty[String]
      gcBeans.forEach(b => ns += b.getName)
      ns.toSeq
    }
    val taskTel = new TaskTelemetryListener
    spark.sparkContext.addSparkListener(taskTel)

    // per-query 1-min load sample taken just BEFORE each query's reps:
    // the start/end pair bounds the sweep, but attributing a single hot
    // query (the r13 qe62 driver-vs-builder question) needs the ambient
    // reading at that query's own slot in the sweep
    val insweepStages = collection.mutable.ArrayBuffer
      .empty[(String, Seq[(String, Double)])]
    val sweep = names.map { n =>
      val ld = loadAvg
      val gc0 = gcMillis
      val (y0ms, y0n, o0ms, o0n) = gcByKind
      val (r0, w0, sp0) = taskTel.snapshot
      val d0 = localDirBytes()
      val t = exec(n)
      // post-query settle BEFORE the closing samples: drop this query's
      // references and collect, so `disk` reads RETAINED growth (what the
      // query left behind after a full reset — the accumulation signal)
      // and `heap` reads live driver heap, not collectable garbage
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val gc1 = gcMillis
      val (y1ms, y1n, o1ms, o1n) = gcByKind
      val (r1, w1, sp1) = taskTel.snapshot
      val d1 = localDirBytes()
      val rt = Runtime.getRuntime
      // columns 7-11 (r17): the per-collector split + committed heap —
      // appended, so existing readers' indices stay valid
      val tel = Seq(gc1 - gc0, r1 - r0, w1 - w0, sp1 - sp0, d1 - d0,
        rt.totalMemory - rt.freeMemory,
        y1ms - y0ms, y1n - y0n, o1ms - o0ms, o1n - o0n, rt.totalMemory)
      // IN-SWEEP attribution (r15 verdict #1): the post-sweep probes
      // exonerated qe62's plan while the in-sweep min read 10× — the
      // missing measurement was the same stages AT the query's own sweep
      // slot. On a hard band violation, re-run this query's stage probes
      // IMMEDIATELY, before the next query perturbs the context. Probe
      // cost lands outside every query's reps, so medians/mins stay pure.
      if (shouldProbeInSweep(n, t._3, SparkEntry.stageProbes.contains))
        insweepStages += n -> timeStages(n, SparkEntry.stageProbes(n))
      (n, t, ld, tel)
    }
    val loadsPerQ = sweep.map { case (n, _, ld, _) => n -> ld }
    val telPerQ = sweep.map { case (n, _, _, tel) => n -> tel }
    val timed4 = sweep.map { case (n, t, _, _) => n -> t }
    val results = timed4.map { case (n, (med, _, _, _)) => n -> med }
    val spreads = timed4.map { case (n, (_, sp, _, _)) => n -> sp }
    val mins = timed4.map { case (n, (_, _, mn, _)) => n -> mn }
    val fits = timed4.map { case (n, (_, _, _, f)) => n -> f }
    // stdout must fit the driver's tail window: it keeps only the LAST
    // 2000 chars of output and the sbt epilogue shares that window, so
    // an oversized line loses its HEAD — the {"metric":"total",... part —
    // and the round's bench silently parses to null. stdout therefore
    // keys each query by its unique id prefix with the constant leading
    // 'q' stripped ("01", "e13b" — see shortKey) at decisecond precision
    // (109 queries fit with headroom; centiseconds no longer did);
    // bench_out.json below keeps full names and full precision and is
    // the authoritative record.
    val keyed = if (results.map(r => shortKey(r._1)).distinct.size == results.size)
      shortKey else identity[String] _ // collision → full names, never ambiguity
    // fit|apply split in the DRIVER-PARSED line (r13 verdict #1): total
    // seconds the sweep spent executing artifact fits — 0.0 on a warm
    // store; a cold store shows exactly the one-time anchor cost that
    // would otherwise masquerade as ambient. Bare seconds (~11 chars):
    // the per-query fit map and count live in bench_out.json, and the
    // tail-window budget (InvariantsSpec) is too tight for more at 164
    // queries. stdout also keys sf by BASENAME for the same budget;
    // bench_out.json keeps the full directory.
    val fitTotal = fits.map(_._2).sum
    // band violations (r14 verdict #2): per-query MIN against the family
    // band — the machine-readable form of "this one query is anomalous".
    // Judged on the min because medians inflate under ambient load; a
    // query whose CHEAPEST of 3 warm reps exceeds its family band is a
    // real regression or a host pathology — the canary gate below tells
    // those apart.
    val (canaryMin, violations, marginal, suppressed) = violationGate(mins)
    val sfShort = java.nio.file.Paths.get(sfDir).getFileName.toString
    // "omit":N appears only when the tail window forced dropping entries
    // (cheapest-first; see stdoutLine) — bench_out.json keeps them all
    val fitExtraFor: Int => String = omitted =>
      s""","fit":${deci(fitTotal)},"viol":${violations.size}""" +
        (if (omitted > 0) s""","omit":$omitted""" else "")
    println(stdoutLine(results, sfShort, keyed, fitExtraFor))
    // stage-attribution pass (r14 verdict #1, narrowed r17 per r16
    // verdict #6): materialize each apply-path stage separately and
    // record its wall clock — the instrument that names WHERE a per-rep
    // premium lives when the per-query total alone cannot. Runs after
    // the sweep so probe cost never pollutes the measured medians; same
    // reset discipline as execOnce so stages don't serve each other's
    // cache. Since r17 only the scheduled REFERENCE probe runs here
    // (see stageRefs) — the in-sweep pass above is the attribution
    // instrument for anomalies.
    // a BLANK env value (an unset template variable) reads as unset, not
    // as "run no reference probe" — the per-sweep healthy baseline must
    // survive harness quirks (review r17)
    val refNames = stageRefs(
      SparkEntry.stageProbes.keys.toSeq.filter(names.contains),
      sys.env.get("SPARK_GRAFT_BENCH_STAGE_REF").map(_.trim).filter(_.nonEmpty))
    val stages = refNames
      .map(n => n -> timeStages(n, SparkEntry.stageProbes(n)))
    // the full-precision line lands in a clean file — the authoritative
    // record for regression tracking; it also carries the rep count and the
    // per-query (max-min) spread across reps so environment noise is
    // distinguishable from regression without a re-run
    val spreadJson = spreads.map { case (k, v) => "\"" + k + "\":" + v.toString }
      .mkString("{", ",", "}")
    val minJson = mins.map { case (k, v) => "\"" + k + "\":" + v.toString }
      .mkString("{", ",", "}")
    // full-precision fit seconds per query (only queries that fit — the
    // map stays small and readable) + the per-query ambient load samples:
    // together these split any inflated median into fit-cost vs
    // hot-host-at-that-slot without a re-run
    // getSystemLoadAverage returns -1.0 where the platform cannot report
    // it — record null, not a misleading negative load
    val fmtLoad: Double => String = v =>
      if (v < 0) "null" else "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val fitJson = fits.filter(_._2 > 0.001)
      .map { case (k, v) => "\"" + k + "\":" + v.toString }
      .mkString("{", ",", "}")
    val loadJson = loadsPerQ
      .map { case (k, v) => "\"" + k + "\":" + fmtLoad(v) }
      .mkString("{", ",", "}")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val loadEnd = loadAvg
    val loads = s"${fmtLoad(loadStart)},${fmtLoad(loadEnd)}"
    // machine-readable band record: every query's band_hi plus the
    // violations list (query, offending min, band) — BENCH_r{N} diffs
    // instead of spreadsheets. The stage map carries the attribution pass.
    val bandJson = names.map(n => "\"" + n + "\":" + bandHi(n).toString)
      .mkString("{", ",", "}")
    def violList(vs: Seq[(String, Double)]): String = vs
      .map { case (n, v) =>
        s"""{"q":"$n","min":$v,"band_hi":${bandHi(n)}}""" }
      .mkString("[", ",", "]")
    val violJson = violList(violations)
    // canary + suppressed ride the artifact so a saturated sweep is
    // self-describing: canary_min > 1.0 explains an empty violations list
    // that would otherwise read as "healthy", and the raw out-of-band
    // mins stay available for the judge
    val canaryExtra =
      s""","canary_min":$canaryMin,"violations_marginal":${violList(marginal)},"violations_suppressed":${violList(suppressed)}"""
    def stagesJsonOf(ss: Seq[(String, Seq[(String, Double)])]): String =
      ss.map { case (n, st) =>
        "\"" + n + "\":" + st.map { case (l, v) => "\"" + l + "\":" + v.toString }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")
    val stagesJson = stagesJsonOf(stages)
    // the r16 in-sweep probe results: same shape as "stages" but timed AT
    // the violating query's own sweep slot — empty on a violation-free
    // sweep. telemetry: per-query [gc_ms, shuffle_read_bytes,
    // shuffle_write_bytes, spill_bytes, retained_disk_delta_bytes,
    // live_heap_bytes] (legend in telemetry_cols), the r15 verdict #1
    // attribution record.
    val stagesInsweepJson = stagesJsonOf(insweepStages.toSeq)
    val telJson = telPerQ.map { case (n, t) =>
      "\"" + n + "\":" + t.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val telCols =
      """["gc_ms","sh_read","sh_write","spill","disk_delta","heap","gc_young_ms","gc_young_n","gc_old_ms","gc_old_n","heap_committed"]"""
    // the live collector names + the hoist flag (when set) make the
    // per-collector split and a permuted sweep self-describing
    val gcNamesJson = gcNames.map(n => "\"" + jsonEscape(n) + "\"")
      .mkString("[", ",", "]")
    val hoistExtra = hoist.map(ps => ps.map(p => "\"" + jsonEscape(p) + "\"")
      .mkString(""","hoist":[""", ",", "]")).getOrElse("")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      renderLine(results, sfDir, _.toString, identity,
        extra = s""","reps":$reps,"load_avg":[$loads],"spread":$spreadJson,"min":$minJson,"fit":$fitJson,"load":$loadJson,"band_hi":$bandJson,"violations":$violJson$canaryExtra,"stages":$stagesJson,"stages_insweep":$stagesInsweepJson,"telemetry_cols":$telCols,"gc_collectors":$gcNamesJson,"telemetry":$telJson$hoistExtra""") + "\n")
    spark.stop()
  }
}
