package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scan-count ratchet: every gate's physical plan is censused for
  * parquet scans per table and compared against the checked-in
  * baseline (tools/plan_scans_baseline.json, written by
  * `runMain graft.PlanScanDump`). A gate that starts scanning a table
  * MORE times than the baseline fails — that shape is exactly how the
  * round-10 ReuseExchange regressions (duplicated explode/join
  * lineages behind alias renames) would reappear. Fewer scans than
  * baseline is an improvement: it passes but is reported so the
  * baseline gets re-dumped and the ratchet tightened.
  */
class PlanScanRatchetSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val baselinePath = "tools/plan_scans_baseline.json"

  test("no gate scans any table more often than the checked-in baseline") {
    val baseline = PlanScans.parseJson(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(baselinePath)), "UTF-8"))
    assert(baseline.nonEmpty, s"$baselinePath missing or empty — " +
      "run: sbt 'runMain graft.PlanScanDump'")

    val rows = PlanScans.census(spark, sfDir)
    val planFailures = rows.collect { case (n, _, Some(e)) => s"$n: $e" }
    assert(planFailures.isEmpty, planFailures.mkString("\n"))

    val regressions = rows.flatMap { case (name, counts, _) =>
      baseline.get(name) match {
        case None =>
          Seq(s"$name: new gate with no baseline entry — " +
            "run: sbt 'runMain graft.PlanScanDump' and review the diff")
        case Some(base) =>
          counts.toSeq.collect {
            case (table, n) if n > base.getOrElse(table, 0) =>
              s"$name: scans $table ${n}x (baseline ${base.getOrElse(table, 0)}x) — " +
                "a lineage is executing more often; if intentional, re-dump the baseline"
          }
      }
    }
    assert(regressions.isEmpty, regressions.mkString("\n"))

    val improvements = rows.flatMap { case (name, counts, _) =>
      baseline.get(name).toSeq.flatMap { base =>
        base.toSeq.collect {
          case (table, b) if counts.getOrElse(table, 0) < b =>
            s"$name: $table ${counts.getOrElse(table, 0)}x < baseline ${b}x"
        }
      }
    }
    if (improvements.nonEmpty)
      info(s"scan-count improvements (re-dump baseline to tighten): " +
        improvements.mkString("; "))
  }
}
