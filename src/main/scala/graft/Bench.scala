package graft

/** Benchmark main: times every SparkEntry query at the SF dir in
  * SPARK_GRAFT_SF_DIR, prints one JSON line for the driver.
  *
  * Each query is timed once per FULL PASS over the suite, two passes, and
  * the per-query min is reported: a single cold run is dominated by
  * first-touch codegen/JIT noise (r1's q05 published 22.4 s cold vs 0.44 s
  * warm), and back-to-back repeats of one query can both land in the same
  * GC/system pause — separating the two timings by a whole sweep
  * decorrelates them. Failures are recorded in an explicit "errors" field
  * instead of being swallowed into a bogus timing.
  *
  * Every timing additionally carries per-query executor metrics from a
  * [[org.apache.spark.scheduler.SparkListener]] — cpu seconds, GC ms,
  * spill bytes, shuffle read/write bytes, and both raw pass walls — so an
  * external-interference window convicts itself inside the artifact: a
  * query whose wall blew up while its cpu/gc/spill stayed at the clean
  * run's level was taxed by the host, not by its plan (round 13 spent a
  * whole judge session adjudicating exactly this: q162 read 108.3 s in the
  * driver artifact and 2.8 s standalone on the same host, and nothing in
  * the JSON could say why).
  */
object Bench {
  private def jstr(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Per-query executor-metric deltas, accumulated task-by-task. */
  final case class QMetrics(
      wall: Double, cpuSec: Double, gcMs: Long, spillBytes: Long,
      shufReadBytes: Long, shufWriteBytes: Long)

  /** Accumulates executor task metrics across the whole app; the bench
    * snapshots before/after each query (queries run strictly sequentially,
    * so deltas attribute exactly). Listener events are asynchronous —
    * snapshots are taken only after the listener bus drains
    * ([[org.apache.spark.sql.graftbridge.ListenerBridge.flush]]).
    */
  private final class MetricsListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNs, gcMs, spill, shufR, shufW = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        gcMs.addAndGet(m.jvmGCTime)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snapshot(): Array[Long] =
      Array(cpuNs.get, gcMs.get, spill.get, shufR.get, shufW.get)
  }

  /** Host fingerprint, embedded in every bench artifact: cpu model, core
    * count, and a fixed ~1 s single-thread xorshift calibration (millions
    * of iterations per second). Same-host reruns vary by a few percent;
    * across VMs the calibration moves with the machine — so a future
    * reader can separate "slow VM" from "real regression" from the JSON
    * alone (round-8 verdict: three same-round totals spread ~15% across
    * hosts with no in-artifact way to tell).
    */
  private def hostFingerprint(): String = {
    val cores = Runtime.getRuntime.availableProcessors()
    val cpu = try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try src.getLines()
        .collectFirst { case l if l.startsWith("model name") => l.split(":", 2)(1).trim }
        .getOrElse("unknown")
      finally src.close()
    } catch { case _: Throwable => "unknown" }
    var x = 0x9E3779B97F4A7C15L
    var blocks = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < 1000000000L) {
      var j = 0
      while (j < 1000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; j += 1 }
      blocks += 1
    }
    // Fold x into the output FOR REAL so the loop cannot be dead-code-
    // eliminated (a `nonce * 0` term is statically zero and lets the JIT
    // drop the loop body, leaving an empty nanoTime spin). blocks is a
    // whole-block count so its low bit carries no timing information —
    // xor-ing x's low bit in perturbs the reading by at most ±1 block.
    s"""{"cpu":${jstr(cpu)},"cores":$cores,"xorshift_mops":${blocks ^ (x & 1L)},"disk_w_mbps":${diskWriteMbps()}}"""
  }

  /** Buffered-write throughput probe (128 MB, plain FileOutputStream +
    * fsync, MB/s) — the second axis of the host fingerprint. The round-14
    * session caught this box's writeback throttled to ~14 MB/s while its
    * CPU fingerprint read healthy (448 Mops): every shuffle-heavy query
    * inflated 5-10× with cpu/gc/plan all normal, which the CPU fingerprint
    * alone cannot explain (q147 at ×100: 347 s with 11.8 GB of shuffle —
    * the disk WAS the time). A reading here under ~50 MB/s marks the whole
    * artifact as IO-throttled; shuffle-volume × this rate bounds any
    * shuffle-heavy query's floor. Runs once, after the suite.
    */
  private def diskWriteMbps(): Long = {
    val f = java.io.File.createTempFile("graft_bench_io", ".bin")
    try {
      val buf = new Array[Byte](1 << 20)
      java.util.Arrays.fill(buf, 0x5A.toByte)
      val t0 = System.nanoTime()
      val out = new java.io.FileOutputStream(f)
      try {
        var i = 0
        while (i < 128) { out.write(buf); i += 1 }
        out.getFD.sync() // writeback included — buffered-only would time memcpy
      } finally out.close()
      val sec = (System.nanoTime() - t0) / 1e9
      math.round(128.0 / sec)
    } catch { case _: Throwable => -1L }
    finally { f.delete(); () }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    def flush() = org.apache.spark.sql.graftbridge.ListenerBridge.flush(spark.sparkContext)
    // JIT + codegen warm-up outside the timed region: run the flagship once.
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, QMetrics] = {
      flush()
      val before = listener.snapshot()
      val t0 = System.nanoTime()
      val r =
        try {
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          flush()
          val d = listener.snapshot().zip(before).map { case (a, b) => a - b }
          Right(QMetrics(wall, d(0) / 1e9, d(1), d(2), d(3), d(4)))
        }
        catch { case e: Throwable => Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120)) }
      // Queries are independent: drop every pinned (checkpointed/cached)
      // RDD once the query's action finishes — OUTSIDE the timed region.
      // Without this, each pass accumulates dead localCheckpoint blocks
      // from every prior query; storage fills mid-pass and later queries
      // pay eviction churn they would never see standalone (q103 measured
      // 3.7 s alone vs 6.8 s late in a loaded pass).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      r
    }
    // Optional comma-separated name-prefix filter (e.g. "q175,q112") for
    // targeted re-measurement — two-run confirms of a single family without
    // paying the whole suite. Unset = the full suite (the artifact of
    // record); filtered runs are for investigation, and the stdout line
    // carries the filter so a partial total can never pass as a suite total.
    val onlyPrefixes = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyPrefixes.forall(_.exists(n.startsWith)) }
    require(ordered.nonEmpty,
      s"SPARK_GRAFT_BENCH_ONLY=${onlyPrefixes.fold("")(_.mkString(","))} matches no queries")
    // Between passes, release superseded localCheckpoint blocks: pinned
    // RDD blocks from the checkpointing operators are only freed when the
    // driver GCs their RDD references (ContextCleaner is weak-ref driven),
    // and with a large heap that may never happen mid-suite — storage
    // memory then fills with dead blocks and later queries pay eviction
    // churn (measured: queries that run in 0.2 s early in a pass took ~3 s
    // late in an un-GC'd sweep).
    def sweep() = {
      val r = ordered.map { case (name, fn) => name -> once(fn) }
      System.gc()
      Thread.sleep(300) // let ContextCleaner drain its async unpersist queue
      r
    }
    val pass1   = sweep()
    val pass2   = sweep()
    val results = pass1.zip(pass2).map { case ((name, r1), (_, r2)) =>
      // min by wall; the winning pass's metrics travel with it, and BOTH
      // raw walls are kept so a single-pass interference window is visible
      val attempt = (r1, r2) match {
        case (Right(a), Right(b)) =>
          Right((if (a.wall <= b.wall) a else b, Some(a.wall), Some(b.wall)))
        case (Right(a), Left(_))  => Right((a, Some(a.wall), None))
        case (Left(_), Right(b))  => Right((b, None, Some(b.wall)))
        case (Left(e), _)         => Left(e)
      }
      name -> attempt
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma-decimal locale would print 1,234 — invalid JSON for the driver
    def ms3(t: Double)  = String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
    val ok   = results.collect { case (n, Right((m, p1, p2))) => (n, m, p1, p2) }
    val errs = results.collect { case (n, Left(e)) => n -> e }
    val qs    = ok.map { case (k, m, _, _) => s"${jstr(k)}:${ms3(m.wall)}" }.mkString("{", ",", "}")
    val es    = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    // Per-query instrumentation (full artifact only): cpu seconds, GC ms,
    // spill and shuffle bytes of the WINNING pass plus both raw walls.
    // Diagnosis rule a reader can apply mechanically: wall ≫ prior-round
    // wall while cpu_sec/gc_ms/shuffle match the prior round = external
    // interference; cpu or spill moved with the wall = the plan changed.
    val met = ok.map { case (k, m, p1, p2) =>
      val walls = Seq(p1.map(w => s""""pass1":${ms3(w)}"""),
                      p2.map(w => s""""pass2":${ms3(w)}""")).flatten.mkString(",")
      s"""${jstr(k)}:{"sec":${ms3(m.wall)},"cpu_sec":${ms3(m.cpuSec)},"gc_ms":${m.gcMs},""" +
        s""""spill_bytes":${m.spillBytes},"shuffle_read_bytes":${m.shufReadBytes},""" +
        s""""shuffle_write_bytes":${m.shufWriteBytes},$walls}"""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2.wall).sum
    val totalCpu = ok.map(_._2.cpuSec).sum
    val totalGc  = ok.map(_._2.gcMs).sum
    // measured AFTER the suite (a concurrent calibration would perturb the
    // timings it is meant to contextualize)
    val host = hostFingerprint()
    // The driver stores only the final ~2 KB of output, so a line carrying
    // all ~196 query timings (~5 KB) always arrived head-truncated and
    // unparseable (BENCH_r07–r10 record `parsed: null`). The stdout line is
    // therefore kept UNDER the window by construction: headline totals, any
    // errors, and the slowest-40 queries (the ones a plan audit reads
    // first), with the complete map persisted to the committed artifact the
    // line points at.
    // a filtered run must never overwrite the suite artifact of record
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (onlyPrefixes.isEmpty) "BENCH_full.json" else "BENCH_filtered.json")
    val qsTop = ok.sortBy(-_._2.wall).take(40)
      .map { case (k, m, _, _) => s"${jstr(k)}:${ms3(m.wall)}" }.mkString("{", ",", "}")
    // The stdout errors payload is BOUNDED (full detail goes to fullPath):
    // with head truncation at the driver, a run with several verbose errors
    // would otherwise push the headline fields out of the kept window.
    val esLine = errs.take(6)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v.take(60))}" }.mkString("{", ",", "}")
    val filterTag = onlyPrefixes.fold("")(p => s""","filtered":${jstr(p.mkString(","))}""")
    // headline fields lead the line AND repeat at its tail, so the metric
    // survives truncation from either end of the stored window
    println(s"""{"metric":"total","value":${ms3(total)},"unit":"sec","sf":"$sfDir","n_ok":${ok.size},"n_err":${errs.size}$filterTag,"cpu_sec_total":${ms3(totalCpu)},"gc_ms_total":$totalGc,"errors":$esLine,"host":$host,"queries":$qsTop,"queries_note":"slowest 40 of ${ok.size}; complete map + per-query cpu/gc/spill/shuffle in $fullPath","tail_metric":"total","tail_value":${ms3(total)},"tail_n_ok":${ok.size},"tail_n_err":${errs.size}}""")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath),
      s"""{"queries":$qs,"metrics":$met,"errors":$es,"n_ok":${ok.size},"n_err":${errs.size}$filterTag,"sf":"$sfDir","host":$host,"cpu_sec_total":${ms3(totalCpu)},"gc_ms_total":$totalGc,"total_sec":${ms3(total)}}""" + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] full-artifact write failed: $e") }
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
