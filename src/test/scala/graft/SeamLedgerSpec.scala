package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-checks the rows-only seam ledger (tools/seam_ledger.json):
  * the claim "every gate without a DuckDB oracle has a declared exact
  * twin / exact sibling / recall floor / property anchor" previously
  * lived in prose (r10 verdict item 3) — this spec makes it erode
  * loudly instead of silently:
  *
  *  - every rows-only gate in SparkEntry must have a ledger entry
  *    (adding a no-oracle gate without declaring its anchor fails);
  *  - every ledger entry must still be rows-only (a gate that gained
  *    an oracle, or was removed, leaves a stale entry — fails);
  *  - twin/sibling witnesses must be REAL oracle-backed gates;
  *  - spec witnesses must be real test classes on the classpath;
  *  - recall floors must equal graft.Verify.annRecallFloors (the copy
  *    the dump emission uses), so the two can't drift apart;
  *  - every entry must state its END-STATE (r11 verdict item 3): either
  *    `terminal: true` (the seam is adjudicated permanent, with the
  *    justification in `note`) or `plan: "..."` (the concrete
  *    conversion path) — so rounds stop re-litigating settled seams.
  */
class SeamLedgerSpec extends AnyFunSuite {

  private val ledgerPath = "tools/seam_ledger.json"

  private case class Entry(anchor: String, witness: String,
      floor: Option[Double], terminal: Boolean, plan: Option[String])

  /** Minimal parser for the flat one-entry-per-line ledger this repo
    * writes (same no-JSON-dependency stance as PlanScans.parseJson). */
  private def parseLedger(text: String): Map[String, Entry] = {
    val entry = ("\"([^\"]+)\"\\s*:\\s*\\{([^}]*)\\}").r
    val field = ("\"([^\"]+)\"\\s*:\\s*(\"([^\"]*)\"|[0-9.]+|true|false)").r
    entry.findAllMatchIn(text).flatMap { m =>
      val gate = m.group(1)
      if (gate == "_comment") None else {
        val fs = field.findAllMatchIn(m.group(2)).map { f =>
          f.group(1) -> Option(f.group(3)).getOrElse(f.group(2))
        }.toMap
        Some(gate -> Entry(fs.getOrElse("anchor", ""),
          fs.getOrElse("witness", ""), fs.get("floor").map(_.toDouble),
          fs.get("terminal").contains("true"), fs.get("plan")))
      }
    }.toMap
  }

  private lazy val ledger = parseLedger(new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ledgerPath)), "UTF-8"))

  private lazy val rowsOnly =
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet

  test("every rows-only gate declares an anchor; no stale entries") {
    val missing = (rowsOnly -- ledger.keySet).toSeq.sorted
    assert(missing.isEmpty,
      s"rows-only gates with NO declared anchor in $ledgerPath: " +
        missing.mkString(", ") + " — declare the twin/sibling/floor/spec " +
        "that makes the gate trustworthy, or give it an oracle")
    val stale = (ledger.keySet -- rowsOnly).toSeq.sorted
    assert(stale.isEmpty,
      s"stale ledger entries (gate now oracle-backed or gone): " +
        stale.mkString(", ") + " — remove them so the ledger stays tight")
  }

  test("twin and sibling witnesses are real oracle-backed gates") {
    val bad = ledger.toSeq.sortBy(_._1).collect {
      case (g, e) if Set("md5_twin", "exact_twin", "exact_sibling")(e.anchor)
          && !SparkEntry.oracleSql.contains(e.witness) =>
        s"$g -> ${e.witness} (${e.anchor})"
    }
    assert(bad.isEmpty, "witness gates missing or themselves rows-only: " +
      bad.mkString(", "))
  }

  test("spec witnesses are real test classes") {
    val bad = ledger.toSeq.sortBy(_._1).collect {
      case (g, e) if Set("recall_floor", "property_spec")(e.anchor) &&
          scala.util.Try(Class.forName(e.witness)).isFailure =>
        s"$g -> ${e.witness}"
    }
    assert(bad.isEmpty, "witness spec classes not found: " + bad.mkString(", "))
  }

  test("anchor kinds are from the known vocabulary") {
    val known = Set("md5_twin", "exact_twin", "exact_sibling",
      "recall_floor", "property_spec")
    val bad = ledger.collect {
      case (g, e) if !known(e.anchor) => s"$g: '${e.anchor}'" }
    assert(bad.isEmpty, "unknown anchor kinds: " + bad.mkString(", "))
  }

  test("every entry states its end-state: terminal xor a conversion plan") {
    val bad = ledger.toSeq.sortBy(_._1).collect {
      case (g, e) if e.terminal == e.plan.isDefined =>
        s"$g (terminal=${e.terminal}, plan=${e.plan.isDefined})"
    }
    assert(bad.isEmpty,
      "ledger entries must carry EXACTLY ONE of terminal:true (with the " +
        "justification in note) or plan:\"...\" (the conversion path): " +
        bad.mkString(", "))
  }

  test("recall floors match the Verify dump emission") {
    val emitted = Verify.annRecallFloors.toMap
    val ledgered = ledger.collect {
      case (g, e) if e.anchor == "recall_floor" => g -> e.floor }
    assert(ledgered.keySet == emitted.keySet,
      s"recall_floor gate sets differ: ledger ${ledgered.keySet.toSeq.sorted} " +
        s"vs Verify ${emitted.keySet.toSeq.sorted}")
    val drift = ledgered.collect {
      case (g, f) if !f.contains(emitted(g)) =>
        s"$g: ledger $f vs Verify ${emitted(g)}" }
    assert(drift.isEmpty, "floor drift: " + drift.mkString(", "))
  }
}
