package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Physical-plan parquet-scan census — the regression net behind the
  * round-10 ReuseExchange findings: three separate gates were measured
  * re-executing an expensive explode/join lineage because alias renames
  * defeated exchange canonicalization (rec_item_similarity, text_textrank,
  * ml_quantile_regression — see PLANS_NOTES.md). The static physical plan
  * shows that duplication as the SAME parquet table scanned N times, so a
  * checked-in per-gate scan-count baseline turns "a refactor quietly
  * doubled a lineage" into a failing test instead of a bench-drift hunt.
  *
  * Counts are taken from the pre-execution plan (AQE initial plan),
  * descending into subqueries; `ReusedExchangeExec` children are NOT
  * re-counted (a reused exchange is the fix, not the bug). Counting is
  * config-sensitive, so the dump main and the ratchet spec must build
  * plans under the SAME session settings — both pin the SparkTestBase
  * config (local[4], 4 shuffle partitions) and sf0.001.
  */
object PlanScans {

  /** Per-table FileSourceScan counts for one physical plan.
    *
    * `seenCaches` dedups descent into `.cache()`d subtrees BY RELATION
    * IDENTITY: an InMemoryTableScan hides its source scans inside
    * `relation.cachedPlan` (they never surface in any action's
    * executedPlan), so the census must descend — but a cache read by
    * N operators materializes ONCE, so the cached lineage is charged
    * once per relation, the same sharing-protection rule as
    * ReusedExchange. Callers censusing several plans of ONE gate pass
    * a shared set; the default charges per-plan. */
  def scanCounts(plan: SparkPlan,
      seenCaches: java.util.Set[AnyRef] =
        java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]()))
      : Map[String, Int] = {
    def tableName(f: FileSourceScanExec): String = {
      val root = f.relation.location.rootPaths.headOption
        .map(_.toString).getOrElse("unknown")
      // .../sf0.001/documents.parquet -> documents; engine-written
      // artifact dirs keep their basename.
      root.split('/').lastOption.getOrElse(root)
        .stripSuffix(".parquet")
    }
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val through = p match {
        case q: QueryStageExec => allNodes(q.plan)
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        // do NOT descend: a reused exchange reads the sibling's
        // materialized output — charging its subtree twice would
        // penalize exactly the sharing this census exists to protect.
        case _: ReusedExchangeExec => Seq.empty
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          // cached lineage: once per CACHE — the dedup key is the
          // shared CachedRDDBuilder, not the InMemoryRelation, because
          // every consuming query gets its own relation COPY
          // (newInstance) while the builder (and the storage it fills)
          // is the one shared object
          if (seenCaches.add(i.relation.cacheBuilder)) allNodes(i.relation.cachedPlan)
          else Seq.empty
        case _ => Seq.empty
      }
      (p +: p.children.flatMap(allNodes)) ++ through ++
        p.subqueries.flatMap(allNodes)
    }
    allNodes(plan)
      .collect { case f: FileSourceScanExec => tableName(f) }
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  /** Accumulates scan counts of every ACTION fired while a gate
    * builder runs: eager `localCheckpoint(true)` pins (and bounded
    * `collect()` artifacts like PQ codebooks) execute their lineage at
    * construction time, so the final plan alone shows an in-memory
    * leaf where the corpus scans actually happened — the census was
    * blind to exactly the lineage the pins exist to protect. */
  private class ConstructionScans
      extends org.apache.spark.sql.util.QueryExecutionListener {
    val acc = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    // per-gate cache-identity dedup, shared with the final-plan count
    // (census resets it via drain); synchronized — the bus thread and
    // the census thread both touch it (never concurrently in practice:
    // the bus is flushed before each read, but cheap insurance)
    @volatile var seenCaches: java.util.Set[AnyRef] = freshSeen()
    def drain(): Map[String, Int] = {
      val m = scala.jdk.CollectionConverters.MapHasAsScala(acc).asScala
        .map { case (k, v) => k -> v.intValue }.toMap
      acc.clear(); seenCaches = freshSeen(); m
    }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      scanCounts(qe.executedPlan, seenCaches).foreach { case (t, n) =>
        acc.merge(t, n, (a, b) => Integer.valueOf(a + b)) }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
  }

  private def freshSeen(): java.util.Set[AnyRef] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]()))

  /** QueryExecutionListener events ride the async listener bus; drain
    * it so construction-action counts are complete before reading.
    * `listenerBus`/`waitUntilEmpty` are private[spark] (public in
    * bytecode) — reflection, no Spark internals copied. */
  private[graft] def flushListenerBus(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
  }

  /** Build every gate's plan on `sfDir` and census its scans: the
    * final plan's FileSourceScans PLUS every scan executed by
    * construction-time actions (checkpoint pins, bounded collects). */
  def census(spark: SparkSession, sfDir: String)
      : Seq[(String, Map[String, Int], Option[String])] = {
    // warm the write-once multimodal artifacts BEFORE counting: on a
    // cold tmpdir the fixture-generation and dump-write jobs would be
    // charged to whichever gate touches them first, tripping the
    // ratchet on a fresh machine even though no plan changed.
    graft.queries.MultimodalQueries.prewarmArtifacts(spark)
    val listener = new ConstructionScans
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        try {
          flushListenerBus(spark); listener.drain() // isolate this gate
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          flushListenerBus(spark)
          val seen = listener.seenCaches // share cache-dedup with final
          val built = {
            val m = scala.jdk.CollectionConverters
              .MapHasAsScala(listener.acc).asScala
              .map { case (k, v) => k -> v.intValue }.toMap
            listener.acc.clear(); m
          }
          val finalCounts = scanCounts(plan, seen)
          val merged = (built.keySet ++ finalCounts.keySet).map { t =>
            t -> (built.getOrElse(t, 0) + finalCounts.getOrElse(t, 0))
          }.toMap
          (name, merged, None)
        } catch {
          case e: Throwable =>
            (name, Map.empty[String, Int], Some(e.getMessage))
        }
      }
    } finally spark.listenerManager.unregister(listener)
  }

  def toJson(rows: Seq[(String, Map[String, Int])]): String =
    rows.sortBy(_._1).map { case (name, counts) =>
      val inner = counts.toSeq.sorted
        .map { case (t, n) => s""""$t":$n""" }.mkString(",")
      s"""  "$name":{$inner}"""
    }.mkString("{\n", ",\n", "\n}\n")

  def parseJson(text: String): Map[String, Map[String, Int]] = {
    // minimal parser for the flat {"gate":{"table":n,...},...} shape
    // this object writes (avoids a JSON dependency).
    val gate = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
    val kv = """"([^"]+)"\s*:\s*(\d+)""".r
    gate.findAllMatchIn(text).map { m =>
      m.group(1) -> kv.findAllMatchIn(m.group(2)).map { p =>
        p.group(1) -> p.group(2).toInt
      }.toMap
    }.toMap
  }
}

/** Writes tools/plan_scans_baseline.json — run after any intentional
  * plan-shape change, with the diff reviewed like any other artifact. */
object PlanScanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "tools/plan_scans_baseline.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = PlanScans.census(spark, sfDir)
    rows.collect { case (n, _, Some(err)) => s"$n: $err" } match {
      case Seq() =>
      case errs =>
        System.err.println(s"[plan-scans] ${errs.size} gates failed to plan:")
        errs.foreach(e => System.err.println(s"  $e"))
        sys.exit(1)
    }
    val json = PlanScans.toJson(rows.map { case (n, c, _) => (n, c) })
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"[plan-scans] wrote ${rows.size} gates to $out")
    spark.stop()
  }
}
