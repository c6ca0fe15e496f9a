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

    val results = order.map { case (name, fn) =>
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
      val prev = try parsePrevQueries(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fullPath)),
        "UTF-8")) catch { case _: Throwable => Map.empty[String, Double] }
      if (prev.size < results.size / 2) "" else {
        val (ambient, flagged) = driftFlags(prev, results.toMap)
        val fl = flagged.map { case (g, p, v, norm) =>
          s""""$g":{"prev":${f3(p)},"cur":${f3(v)},"prev_ambient_norm":${f3(norm)}}"""
        }.mkString("{", ",", "}")
        s""","drifts":{"ambient_ratio":${f3(ambient)},"flagged":$fl}"""
      }
    }

    // The full per-query map (~4.6 KB at 108 queries) overflows the
    // driver's ~3.5 KB stdout tail window and truncates the head of the
    // line — so it goes to a side file, and stdout gets a compact
    // summary (<1 KB) that survives the tail intact.
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"errors":$errJson$driftJson,"sf":"$sfDir"}"""
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
