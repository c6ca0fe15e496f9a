package graft

import org.apache.spark.sql.SparkSession
import java.util.Locale

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name:sec,...}}.
  * local[32] with 32 shuffle partitions + AQE, per the target config.
  *
  * Robustness contract (what makes the numbers reproducible run-to-run
  * and machine-to-machine):
  *  - queries run in a FIXED but non-alphabetical order (stable hash of
  *    the name) so results never depend on alphabetical neighbors;
  *  - before each measurement: caches dropped, an explicit GC, and a
  *    short settle, so no query inherits the previous query's cached
  *    tables or GC debt;
  *  - each query gets one unmeasured warmup run (codegen compilation +
  *    JIT happen there), then TWO measured cold-data runs of which the
  *    MINIMUM is reported — the standard steady-state estimator, robust
  *    to transient host load landing on one run;
  *  - failures are recorded as value -1 plus an "errors" list instead
  *    of a normal-looking elapsed time;
  *  - all numbers formatted with Locale.ROOT (a comma-decimal locale
  *    would otherwise emit invalid JSON).
  */
object Bench {

  /** Pinned drift-control gates: stable, cheap, family-spread gates
    * whose code paths change rarely — the median cur/prev ratio over
    * them estimates AMBIENT machine speed (the PLANS_NOTES "measure
    * untouched controls first" method, mechanized). A gate is flagged
    * as a drift only if it moved >30% AND >0.5 s beyond that ambient
    * ratio, so a uniformly slower session flags nothing. */
  private val driftControls = Seq("a1_multi_agg", "p6_isin", "w2_lag",
    "o4_topk", "dedup_simhash", "a_markov_transitions")

  /** Parse the "queries" per-gate map out of a previous BENCH_FULL
    * line (no-JSON-dependency stance, same as PlanScans.parseJson). */
  private[graft] def parsePrevQueries(text: String): Map[String, Double] = {
    val qblock = """"queries"\s*:\s*\{([^}]*)\}""".r
    val kv = """"([^"]+)"\s*:\s*(-?[0-9.]+)""".r
    qblock.findFirstMatchIn(text).map { m =>
      kv.findAllMatchIn(m.group(1))
        .map(p => p.group(1) -> p.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
  }

  /** Canary checkpoint cadence: one canary sample every this many
    * gates (plus one before the first and one after the last). */
  private[graft] val canaryPeriod = 20

  /** Parse the "canary" sample array out of a previous BENCH_FULL
    * line; empty if the previous run predates the canary format. */
  private[graft] def parsePrevCanary(text: String): Seq[Double] = {
    val arr = """"canary"\s*:\s*\[([^\]]*)\]""".r
    arr.findFirstMatchIn(text).map(
      _.group(1).split(",").filter(_.nonEmpty).toSeq.map(_.trim.toDouble))
      .getOrElse(Seq.empty)
  }

  /** Parse the "canary_pos" gate-position array (r12 format); empty if
    * the previous run predates it (then canaries pair by index). */
  private[graft] def parsePrevCanaryPos(text: String): Seq[Int] = {
    val arr = """"canary_pos"\s*:\s*\[([^\]]*)\]""".r
    arr.findFirstMatchIn(text).map(
      _.group(1).split(",").filter(_.nonEmpty).toSeq.map(_.trim.toInt))
      .getOrElse(Seq.empty)
  }

  /** Parse the recorded driver heap (r13 format); None for runs that
    * predate it. Anchored to the TOP-LEVEL field: only the line prefix
    * before the first `"queries"` key is scanned, so a future nested
    * key spelled exactly `"driver_mem_mb"` (e.g. inside a per-gate
    * drift block, which always serializes after `"queries"`) can never
    * be misread as the run's heap (r13 ADVICE item 4). */
  private[graft] def parsePrevDriverMem(text: String): Option[Long] = {
    val upto = text.indexOf("\"queries\"")
    val scope = if (upto >= 0) text.substring(0, upto) else text
    val m = """"driver_mem_mb"\s*:\s*([0-9]+)""".r
    m.findFirstMatchIn(scope).map(_.group(1).toLong)
  }

  /** The drift comparison binds only within one memory envelope: the
    * r12 judge measured the SAME bench >3× slower wall under a small
    * heap (evicted localCheckpoints recompute), so comparing runs
    * across heap configs flags plan-unchanged gates. A >±25% heap
    * difference disarms the ledger LOUDLY (a previous run that never
    * recorded its heap — pre-r13 format — stays armed; the re-baseline
    * at round close closes that hole permanently). */
  private[graft] def memMismatch(prevMb: Option[Long], curMb: Long): Boolean =
    prevMb.exists(p => p > 0 &&
      (curMb.toDouble / p < 0.75 || curMb.toDouble / p > 1.25))

  /** The solo-A/B adjudication stage (r12 verdict item 1, mechanizing
    * the manual PLANS_NOTES protocol that resolved BOTH r12 flags): a
    * flag that survives the control-median AND bracketing-canary
    * stages can still be a gate-local transient (GC pause, one noisy
    * neighbor burst landing on both measured runs). At end of run the
    * gate is re-measured SOLO (min-of-3 on the now-idle suite JVM)
    * together with a small panel of pinned controls; the MEDIAN
    * solo/prev ratio over the panel re-normalizes ambient at
    * adjudication time (r13 ADVICE item 1: a single control can be
    * gate-locally noisy, and its transient would skew every solo
    * baseline in the same direction — the median over 3 mirrors the
    * stage-1 control-median design), and the verdict is the same
    * >30% AND >0.5 s rule against that solo baseline.
    * `measure` is injected (BenchDriftSpec drives it with canned
    * samples) and reports failure as a NEGATIVE value (the suite's -1
    * convention) — a failed gate measure gets verdict `solo_error`
    * (not a silent absolution), and controls whose measure fails (or
    * that have no previous reading) drop out of the median; an empty
    * panel falls back to ambient 1.0. Returns (gate, flaggedCur,
    * soloSec, soloBaseline, verdict ∈ regression|transient|solo_error). */
  private[graft] def adjudicateFlags(
      flagged: Seq[(String, Double, Double, Double)],
      controls: Seq[(String, Option[Double])],
      measure: String => Double): Seq[(String, Double, Double, Double, String)] = {
    if (flagged.isEmpty) Seq.empty
    else {
      val ratios = controls.flatMap {
        case (g, Some(p)) if p > 0 =>
          val solo = measure(g)
          if (solo > 0) Some(solo / p) else None
        case _ => None
      }.sorted
      // true median: even-sized panels average the two middles — with
      // one control dropped out of a 3-panel, a single noisy survivor
      // must not fully determine ambient (the review case: {1.0, 2.5}
      // reads 1.75, not 2.5)
      val ambient =
        if (ratios.isEmpty) 1.0
        else if (ratios.size % 2 == 1) ratios(ratios.size / 2)
        else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2
      flagged.map { case (g, p, v, _) =>
        val solo = measure(g)
        val base = p * ambient
        val verdict =
          if (solo < 0) "solo_error"
          else if (solo > base * 1.3 && solo - base > 0.5) "regression"
          else "transient"
        (g, v, solo, base, verdict)
      }
    }
  }

  /** Second-stage drift normalization from interleaved canary samples:
    * the global control-median ratio under-normalizes gates that ran
    * during a transient load stretch (ambient on a shared box moves
    * minute-to-minute — measured in PLANS_NOTES r11: in one run the
    * global ratio was 1.038 while same-window controls read 1.5-1.9×).
    * A canary (fixed small aggregate) sampled every [[canaryPeriod]]
    * gates gives each gate the ambient ratio AT ITS MOMENT: the
    * returned function maps a gate's run position to the MAX of the
    * two canary cur/prev ratios bracketing it. Each CURRENT canary
    * pairs with the PREVIOUS canary nearest in RECORDED GATE POSITION
    * (r11 ADVICE: index pairing shifts every later bracket by a full
    * period when gates are added/removed early in the deterministic
    * order); a previous run predating the position format falls back
    * to index pairing. Returns None when either run carries fewer
    * than 2 canaries — callers then filter nothing. */
  private[graft] def localRatios(
      prevCanary: Seq[Double], prevPos: Seq[Int],
      curCanary: Seq[Double], curPos: Seq[Int]): Option[Int => Double] = {
    if (prevCanary.size < 2 || curCanary.size < 2) None
    else {
      val cp: Seq[Int] =
        if (curPos.size == curCanary.size) curPos
        else curCanary.indices.map(_ * canaryPeriod)
      def ratio(i: Int): Double = {
        val prevIdx =
          if (prevPos.size == prevCanary.size)
            prevPos.indices.minBy(j => (math.abs(prevPos(j) - cp(i)), j))
          else math.min(i, prevCanary.size - 1)
        val p = prevCanary(prevIdx); val c = curCanary(i)
        if (p > 0 && c > 0) c / p else 1.0
      }
      Some { pos =>
        val k = cp.lastIndexWhere(_ <= pos)
        val lo = math.min(math.max(k, 0), curCanary.size - 2)
        math.max(ratio(lo), ratio(lo + 1))
      }
    }
  }

  /** Ambient-normalized drift flags vs the previous full run.
    * @return (ambientRatio, flagged, controlsResolved) where flagged
    *         lists (gate, prevSec, curSec, ambientNormalizedPrevSec).
    *         controlsResolved < 3 means normalization is DISARMED
    *         (ambient 1.0, nothing flagged) — callers must surface
    *         that loudly instead of omitting the block (r11 verdict:
    *         a control-gate rename silently killed the ledger). */
  private[graft] def driftFlags(prev: Map[String, Double],
      cur: Map[String, Double]): (Double, Seq[(String, Double, Double, Double)], Int) = {
    val ratios = driftControls.flatMap { c =>
      (prev.get(c), cur.get(c)) match {
        case (Some(p), Some(v)) if p > 0 && v > 0 => Some(v / p)
        case _ => None
      }
    }.sorted
    if (ratios.size < 3) (1.0, Seq.empty, ratios.size) // disarmed, not guessing
    else {
      val ambient = ratios(ratios.size / 2)
      val flagged = cur.toSeq.sortBy(_._1).flatMap { case (g, v) =>
        prev.get(g) match {
          case Some(p) if p > 0 && v > 0 =>
            val norm = p * ambient
            if (v > norm * 1.3 && v - norm > 0.5) Some((g, p, v, norm))
            else None
          case _ => None
        }
      }
      (ambient, flagged, ratios.size)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // The memory envelope that shapes the numbers (r12 verdict item 2):
    // recorded in BENCH_FULL so the drift loader can refuse to compare
    // runs across heap configs. -Xmx is what actually bounds the
    // local-mode driver (SPARK_DRIVER_MEM via build.sbt/run_graft.sh).
    val driverMemMb = Runtime.getRuntime.maxMemory() / (1024L * 1024L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: benign WARNs (e.g. WindowExec on deliberately
    // tiny single-partition windows) would land in the driver's ~3.5 KB
    // stdout tail window and can crowd out the summary JSON line.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session once (parquet footer reads, first-job setup).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // Local-iteration filter (builder-only, mirrors Verify): restricts
    // the run to the named queries. Unset (the driver) = run all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val order = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) => (scala.util.hashing.MurmurHash3.stringHash(name), name) }

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
      catch {
        case _: Throwable =>
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
      }

    def settle(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
    }

    // Canary: a fixed small scan+aggregate sampled every canaryPeriod
    // gates — ONE sample on purpose (it measures the instantaneous
    // ambient, noise included). Full runs only; its samples feed the
    // localDriftFilter so a gate that ran during a transient load
    // stretch isn't flagged against a global ratio sampled elsewhere.
    def canaryOnce(): Double = {
      settle()
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
        .agg(org.apache.spark.sql.functions.sum("l_quantity"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val canaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    val canaryPos = scala.collection.mutable.ArrayBuffer.empty[Int]
    val measureCanary = only.isEmpty
    if (measureCanary) { // warm once
      canaryOnce(); canaries += canaryOnce(); canaryPos += 0
    }

    val results = order.zipWithIndex.map { case ((name, fn), i) =>
      if (measureCanary && i > 0 && i % canaryPeriod == 0) {
        canaries += canaryOnce(); canaryPos += i
      }
      settle()
      runOnce(fn) // warmup: codegen + JIT, result discarded
      val measured = (1 to 2).map { _ =>
        settle()
        val t0 = System.nanoTime()
        val ok = runOnce(fn)
        val elapsed = (System.nanoTime() - t0) / 1e9
        if (ok) elapsed else -1.0
      }
      name -> (if (measured.exists(_ < 0)) -1.0 else measured.min)
    }
    if (measureCanary) { canaries += canaryOnce(); canaryPos += order.size }

    def f3(v: Double): String = String.format(Locale.ROOT, "%.3f", v)
    val errors = results.collect { case (n, v) if v < 0 => n }
    val qs = results.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Automated drift ledger: compare this FULL run to the previous
    // committed full run (BENCH_FULL.json, read before we overwrite
    // it), ambient-normalized by the control-gate median ratio, then
    // re-filtered by the canary ratio local to each gate's run
    // position. Solo (SPARK_GRAFT_ONLY) runs skip it — partial maps
    // can't normalize. The block is ALWAYS emitted on full runs, with
    // disarmed states loud (r11 verdict: a truncated previous map or a
    // control-gate rename used to kill the ledger with zero signal),
    // and gates the canary stage absolves are recorded with the
    // bracketing ratio that cleared them (audit trail, not dropped).
    // Returns (fullBlock, stdoutBlock): stdout carries flagged capped
    // at 5 + counts only, so many flags can't overflow the ~3.5 KB
    // stdout tail window the side-file split protects.
    // Subset runs must not clobber the committed drift base: without an
    // explicit override their side file goes to /tmp.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      if (only.isEmpty) "BENCH_FULL.json" else "/tmp/BENCH_SUBSET.json")
    val (driftJson, driftStdout) = if (only.nonEmpty) ("", "") else {
      val prevText = try new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fullPath)),
        "UTF-8") catch { case _: Throwable => "" }
      val prev = parsePrevQueries(prevText)
      val prevMem = parsePrevDriverMem(prevText)
      if (prev.size < results.size / 2) {
        System.err.println(s"[bench] drift ledger DISARMED: previous full " +
          s"map resolves ${prev.size} of ${results.size} gates")
        val b = s""","drifts":{"disarmed":true,"reason":"prev_map_too_small","prev_queries":${prev.size}}"""
        (b, b)
      } else if (memMismatch(prevMem, driverMemMb)) {
        // r12 verdict item 2: two honest runs under different heaps
        // disagree >3× on checkpoint-heavy gates — say so instead of
        // flagging plan-unchanged gates
        System.err.println(s"[bench] drift ledger DISARMED: driver heap " +
          s"changed (prev ${prevMem.get} MiB, cur $driverMemMb MiB) — " +
          "cross-config comparisons don't bind")
        val b = s""","drifts":{"disarmed":true,"reason":"config_mismatch","prev_driver_mem_mb":${prevMem.get},"cur_driver_mem_mb":$driverMemMb}"""
        (b, b)
      } else {
        val (ambient, flaggedGlobal, nControls) =
          driftFlags(prev, results.toMap)
        val disarmed = nControls < 3
        if (disarmed)
          System.err.println(s"[bench] drift ledger DISARMED: only " +
            s"$nControls of ${driftControls.size} control gates resolved " +
            "(<3) — ambient normalization cannot bind")
        // a gate must exceed the threshold against BOTH the global
        // control ratio AND the canary ratio local to its run position
        // — transient load stretches stop producing false flags
        val posOf = order.map(_._1).zipWithIndex.toMap
        val localR = localRatios(parsePrevCanary(prevText),
          parsePrevCanaryPos(prevText), canaries.toSeq, canaryPos.toSeq)
        def localAt(g: String): Option[Double] =
          localR.map(f => f(posOf.getOrElse(g, 0)))
        val (flagged, absolved) = flaggedGlobal.partition {
          case (g, p, v, _) => localAt(g).forall { lr =>
            v > p * lr * 1.3 && v - p * lr > 0.5 }
        }
        // the third, final stage: surviving flags self-adjudicate by an
        // end-of-run solo re-measure (the suite is idle now). Capped —
        // a run with many survivors is an ambient anomaly the solo
        // protocol can't amortize, and the cap is recorded.
        val soloCap = 10
        val toSolo = flagged
          .sortBy { case (_, _, v, norm) => -(v / math.max(norm, 1e-9)) }
          .take(soloCap)
        def soloMeasure(g: String): Double =
          SparkEntry.queries.get(g) match {
            case None => -1.0
            case Some(fn) =>
              runOnce(fn) // warm
              val oks = (1 to 3).flatMap { _ =>
                settle()
                val t0 = System.nanoTime()
                val ok = runOnce(fn)
                val e = (System.nanoTime() - t0) / 1e9
                if (ok) Some(e) else None
              }
              if (oks.isEmpty) -1.0 else oks.min // -1 = measure failed
          }
        // solo-stage ambient panel: the first 3 pinned controls (median
        // of their solo/prev ratios — r13 ADVICE item 1)
        val verdicts = adjudicateFlags(toSolo,
          driftControls.take(3).map(c => c -> prev.get(c)), soloMeasure)
          .map(v => v._1 -> v).toMap
        def entries(fs: Seq[(String, Double, Double, Double)],
            withLocal: Boolean, soloStage: Boolean = false): String =
          fs.map { case (g, p, v, norm) =>
            val local = if (!withLocal) "" else
              s""","local_canary_ratio":${f3(localAt(g).getOrElse(1.0))}"""
            // a flagged gate past the soloCap still carries an explicit
            // verdict — skipped_ambient, never a silent absence (r13
            // verdict item 7: a pathological run must self-describe)
            val solo = verdicts.get(g).map { case (_, _, s, base, verdict) =>
              s""","flagged_ratio":${f3(v / math.max(norm, 1e-9))}""" +
                s""","solo_sec":${f3(s)},"solo_baseline":${f3(base)}""" +
                s""","verdict":"$verdict""""
            }.getOrElse(
              if (soloStage) s""","verdict":"skipped_ambient"""" else "")
            s""""$g":{"prev":${f3(p)},"cur":${f3(v)},"prev_ambient_norm":${f3(norm)}$local$solo}"""
          }.mkString("{", ",", "}")
        val regressions = verdicts.values.count(_._5 == "regression")
        val head = s""","drifts":{"ambient_ratio":${f3(ambient)},"controls_resolved":$nControls,"disarmed":$disarmed"""
        val soloMeta = s""","solo_adjudicated":${verdicts.size},"solo_skipped":${flagged.size - verdicts.size},"regressions":$regressions"""
        val full = s"""$head$soloMeta,"flagged":${entries(flagged, withLocal = false, soloStage = true)},"absolved":${entries(absolved, withLocal = true)}}"""
        val top5 = toSolo.take(5) // same worst-survivor ranking
        val compact = s"""$head$soloMeta,"flagged_n":${flagged.size},"flagged_top":${
          entries(top5, withLocal = false, soloStage = true)},"absolved_n":${absolved.size}}"""
        (full, compact)
      }
    }
    val canaryJson = if (canaries.isEmpty) "" else
      s""","canary_period":$canaryPeriod,"canary":${
        canaries.map(f3).mkString("[", ",", "]")},"canary_pos":${
        canaryPos.mkString("[", ",", "]")}"""

    // The full per-query map (~4.6 KB at 108 queries) overflows the
    // driver's ~3.5 KB stdout tail window and truncates the head of the
    // line — so it goes to a side file, and stdout gets a compact
    // summary (<1 KB) that survives the tail intact.
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","cpus":"$cpus","driver_mem_mb":$driverMemMb,"queries":$qs,"errors":$errJson$driftJson$canaryJson,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get(fullPath)
      java.nio.file.Files.write(p, fullLine.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // summary line below is still authoritative

    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"driver_mem_mb":$driverMemMb,"errors":$errJson$driftStdout,"slowest":$slowest,"sf":"$sfDir","full":"$fullPath"}""")
    spark.stop()
  }
}
