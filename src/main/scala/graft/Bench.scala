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

  /** Second-stage drift filter using interleaved canary samples: the
    * global control-median ratio under-normalizes gates that ran
    * during a transient load stretch (ambient on a shared box moves
    * minute-to-minute — measured in PLANS_NOTES r11: in one run the
    * global ratio was 1.038 while same-window controls read 1.5-1.9×).
    * A canary (fixed small aggregate) sampled every `period` gates
    * gives each gate the ambient ratio AT ITS MOMENT: a gate survives
    * this filter only if it exceeds 1.3× + 0.5 s beyond the MAX of the
    * two canary ratios bracketing its run position. Checkpoint j of
    * the current run aligns with checkpoint j of the previous run
    * (same deterministic hash order; a small gate-set change shifts
    * positions by at most a few gates, absorbed by the bracketing
    * max). Returns the gates that survive; callers intersect with the
    * global flags, so a canary-format-less previous run filters
    * nothing. */
  private[graft] def localDriftFilter(
      prev: Map[String, Double], curOrdered: Seq[(String, Double)],
      prevCanary: Seq[Double], curCanary: Seq[Double],
      period: Int = canaryPeriod): Set[String] = {
    val m = math.min(prevCanary.size, curCanary.size)
    if (m < 2) curOrdered.map(_._1).toSet // no canary data: filter nothing
    else {
      def ratio(j: Int): Double = {
        val p = prevCanary(j); val c = curCanary(j)
        if (p > 0 && c > 0) c / p else 1.0
      }
      curOrdered.zipWithIndex.flatMap { case ((g, v), pos) =>
        prev.get(g) match {
          case Some(pv) if pv > 0 && v > 0 =>
            val lo = math.min(pos / period, m - 2)
            val local = math.max(ratio(lo), ratio(lo + 1))
            val norm = pv * local
            if (v > norm * 1.3 && v - norm > 0.5) Some(g) else None
          case _ => None
        }
      }.toSet
    }
  }

  /** Ambient-normalized drift flags vs the previous full run.
    * @return (ambientRatio, flagged) where flagged lists
    *         (gate, prevSec, curSec, ambientNormalizedPrevSec). */
  private[graft] def driftFlags(prev: Map[String, Double],
      cur: Map[String, Double]): (Double, Seq[(String, Double, Double, Double)]) = {
    val ratios = driftControls.flatMap { c =>
      (prev.get(c), cur.get(c)) match {
        case (Some(p), Some(v)) if p > 0 && v > 0 => Some(v / p)
        case _ => None
      }
    }.sorted
    if (ratios.size < 3) (1.0, Seq.empty) // not enough controls to normalize
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
      (ambient, flagged)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val measureCanary = only.isEmpty
    if (measureCanary) { canaryOnce(); canaries += canaryOnce() } // warm once

    val results = order.zipWithIndex.map { case ((name, fn), i) =>
      if (measureCanary && i > 0 && i % canaryPeriod == 0)
        canaries += canaryOnce()
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
    if (measureCanary) canaries += canaryOnce()

    def f3(v: Double): String = String.format(Locale.ROOT, "%.3f", v)
    val errors = results.collect { case (n, v) if v < 0 => n }
    val qs = results.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Automated drift ledger: compare this FULL run to the previous
    // committed full run (BENCH_FULL.json, read before we overwrite
    // it), ambient-normalized by the control-gate median ratio. Solo
    // (SPARK_GRAFT_ONLY) runs skip it — partial maps can't normalize.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
    val driftJson = if (only.nonEmpty) "" else {
      val prevText = try new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fullPath)),
        "UTF-8") catch { case _: Throwable => "" }
      val prev = parsePrevQueries(prevText)
      if (prev.size < results.size / 2) "" else {
        val (ambient, flaggedGlobal) = driftFlags(prev, results.toMap)
        // a gate must exceed the threshold against BOTH the global
        // control ratio AND the canary ratio local to its run position
        // — transient load stretches stop producing false flags
        val survivesLocal = localDriftFilter(prev, results,
          parsePrevCanary(prevText), canaries.toSeq)
        val flagged = flaggedGlobal.filter(f => survivesLocal(f._1))
        val fl = flagged.map { case (g, p, v, norm) =>
          s""""$g":{"prev":${f3(p)},"cur":${f3(v)},"prev_ambient_norm":${f3(norm)}}"""
        }.mkString("{", ",", "}")
        s""","drifts":{"ambient_ratio":${f3(ambient)},"flagged":$fl}"""
      }
    }
    val canaryJson = if (canaries.isEmpty) "" else
      s""","canary_period":$canaryPeriod,"canary":${
        canaries.map(f3).mkString("[", ",", "]")}"""

    // The full per-query map (~4.6 KB at 108 queries) overflows the
    // driver's ~3.5 KB stdout tail window and truncates the head of the
    // line — so it goes to a side file, and stdout gets a compact
    // summary (<1 KB) that survives the tail intact.
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"errors":$errJson$driftJson$canaryJson,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get(fullPath)
      java.nio.file.Files.write(p, fullLine.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // summary line below is still authoritative

    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"errors":$errJson$driftJson,"slowest":$slowest,"sf":"$sfDir","full":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
