package graft

import org.scalatest.funsuite.AnyFunSuite

/** The automated drift ledger (Bench.driftFlags) mechanizes the
  * PLANS_NOTES control-gate method: a uniformly slower machine flags
  * NOTHING, while a gate that moved beyond the ambient band by >30%
  * and >0.5 s is flagged with its ambient-normalized baseline. */
class BenchDriftSpec extends AnyFunSuite {

  private val controls = Map(
    "a1_multi_agg" -> 0.5, "p6_isin" -> 0.4, "w2_lag" -> 0.6,
    "o4_topk" -> 0.7, "dedup_simhash" -> 1.0, "a_markov_transitions" -> 0.8)

  /** The survivor rule main() applies on top of [[Bench.localRatios]]:
    * a globally-flagged gate stays flagged only if it also beats the
    * canary ratio local to its run position. */
  private def survives(prev: Double, cur: Double, local: Double): Boolean =
    cur > prev * local * 1.3 && cur - prev * local > 0.5

  test("uniform ambient slowdown flags nothing") {
    val prev = controls ++ Map("expensive_gate" -> 4.0)
    val cur = prev.view.mapValues(_ * 1.6).toMap // whole machine 1.6x slower
    val (ambient, flagged, n) = Bench.driftFlags(prev, cur)
    assert(math.abs(ambient - 1.6) < 1e-9)
    assert(flagged.isEmpty && n == controls.size)
  }

  test("a real regression is flagged with its normalized baseline") {
    val prev = controls ++ Map("regressed" -> 2.0, "steady" -> 3.0)
    val cur = prev.map { case (k, v) =>
      k -> (if (k == "regressed") v * 3 else v * 1.1) }
    val (ambient, flagged, _) = Bench.driftFlags(prev, cur)
    assert(math.abs(ambient - 1.1) < 1e-9)
    assert(flagged.map(_._1) == Seq("regressed"))
    val (_, p, v, norm) = flagged.head
    assert(p == 2.0 && v == 6.0 && math.abs(norm - 2.2) < 1e-9)
  }

  test("small absolute moves are not flagged even at high ratios") {
    val prev = controls ++ Map("tiny" -> 0.1)
    val cur = prev.map { case (k, v) =>
      k -> (if (k == "tiny") 0.5 else v) } // 5x but only +0.4s
    assert(Bench.driftFlags(prev, cur)._2.isEmpty)
  }

  test("too few controls disarms normalization AND reports the count") {
    val prev = Map("a1_multi_agg" -> 0.5, "w2_lag" -> 0.6, "other" -> 5.0)
    val cur = Map("a1_multi_agg" -> 1.0, "w2_lag" -> 1.2, "other" -> 20.0)
    val (ambient, flagged, n) = Bench.driftFlags(prev, cur)
    // right call on normalization (no guessing), but the resolved-
    // control count is surfaced so main() can say DISARMED loudly
    assert(ambient == 1.0 && flagged.isEmpty && n == 2)
  }

  test("localRatios clears gates that ran during a load stretch") {
    // canaries at positions 0/20/40/60 read 1x, 2x, 2x, 1x vs prev
    val prevCanary = Seq(0.3, 0.3, 0.3, 0.3)
    val curCanary = Seq(0.3, 0.6, 0.6, 0.3)
    val pos = Seq(0, 20, 40, 60)
    val f = Bench.localRatios(prevCanary, pos, curCanary, pos).get
    // a 2x gate inside the stretch is bracketed by a 2x canary ratio
    (20 until 40).foreach { p => assert(!survives(1.0, 2.0, f(p))) }
  }

  test("localRatios keeps a real regression even near a load stretch") {
    val prevCanary = Seq(0.3, 0.3, 0.3)
    val curCanary = Seq(0.3, 0.55, 0.55) // local ambient ~1.83x
    val pos = Seq(0, 20, 40)
    val f = Bench.localRatios(prevCanary, pos, curCanary, pos).get
    assert(survives(1.0, 5.0, f(25)))  // 5x >> 1.3 * 1.83x
    assert(!survives(1.0, 1.8, f(30))) // 1.8x == ambient, cleared
  }

  test("localRatios without canary data yields None (filter nothing)") {
    assert(Bench.localRatios(Seq.empty, Seq.empty, Seq.empty, Seq.empty).isEmpty)
    assert(Bench.localRatios(Seq(0.3), Seq(0), Seq(0.3, 0.3), Seq(0, 20)).isEmpty)
  }

  test("canaries pair by recorded gate position, not array index") {
    // previous run had a late load stretch (canary 0.6 at pos 40);
    // the current run samples only at 0 and 40 (e.g. gates removed).
    // Index pairing would match cur[1] (pos 40) to prev[1] (pos 20,
    // 0.3) → ratio 2.0, wrongly absolving a real regression there;
    // position pairing matches pos 40 to pos 40 → ratio 1.0.
    val f = Bench.localRatios(
      prevCanary = Seq(0.3, 0.3, 0.6), prevPos = Seq(0, 20, 40),
      curCanary = Seq(0.3, 0.6), curPos = Seq(0, 40)).get
    assert(math.abs(f(39) - 1.0) < 1e-9)
    assert(survives(1.0, 2.0, f(39))) // the regression stays flagged
  }

  test("previous run without positions falls back to index pairing") {
    val f = Bench.localRatios(
      prevCanary = Seq(0.3, 0.3, 0.3), prevPos = Seq.empty,
      curCanary = Seq(0.3, 0.6, 0.6), curPos = Seq(0, 20, 40)).get
    assert(math.abs(f(25) - 2.0) < 1e-9)
  }

  test("parsePrevCanary reads the canary array") {
    val line = """{"queries":{"a":1.0},"canary_period":20,"canary":[0.210,0.315,0.220]}"""
    assert(Bench.parsePrevCanary(line) == Seq(0.21, 0.315, 0.22))
    assert(Bench.parsePrevCanary("""{"queries":{"a":1.0}}""") == Seq.empty)
  }

  test("parsePrevCanaryPos reads the position array; legacy runs empty") {
    val line = """{"canary":[0.2,0.3],"canary_pos":[0,20]}"""
    assert(Bench.parsePrevCanaryPos(line) == Seq(0, 20))
    assert(Bench.parsePrevCanaryPos("""{"canary":[0.2,0.3]}""") == Seq.empty)
  }

  /** The solo-panel shape main() passes: 3 pinned controls with their
    * previous readings. */
  private val soloPanel: Seq[(String, Option[Double])] = Seq(
    "a1_multi_agg" -> Some(0.50), "p6_isin" -> Some(0.40),
    "w2_lag" -> Some(0.60))

  test("a surviving flag self-adjudicates by solo re-measure") {
    // the r12 judge case: dedup_fuzzy_levenshtein flagged at 2.88 in
    // suite (prev 1.71), solo re-measure read 1.58 → transient. The
    // injected slow SUITE sample must not survive a clean solo reading.
    val flagged = Seq(("gate_x", 1.71, 2.88, 1.75))
    def run(samples: Map[String, Double]) =
      Bench.adjudicateFlags(flagged, soloPanel, measure = samples.apply)
    val steady = Map("a1_multi_agg" -> 0.50, "p6_isin" -> 0.40,
      "w2_lag" -> 0.60)
    val transient = run(steady + ("gate_x" -> 1.58))
    assert(transient === Seq(("gate_x", 2.88, 1.58, 1.71, "transient")))
    // the solo reading confirms the slowdown → regression
    val regression = run(steady + ("gate_x" -> 2.85))
    assert(regression.head._5 === "regression")
    assert(regression.head._4 === 1.71) // solo baseline = prev * ambient
    // a machine uniformly 2x slower at adjudication time re-normalizes:
    // gate at 2x its prev with the panel also at 2x is NOT a regression
    val ambient2x = run(Map("gate_x" -> 3.40, "a1_multi_agg" -> 1.00,
      "p6_isin" -> 0.80, "w2_lag" -> 1.20))
    assert(math.abs(ambient2x.head._4 - 3.42) < 1e-9)
    assert(ambient2x.head._5 === "transient")
    assert(Bench.adjudicateFlags(Seq.empty, soloPanel,
      _ => fail("no flags, no measures")).isEmpty)
  }

  test("solo ambient is the MEDIAN over the control panel, not one gate") {
    // r13 ADVICE item 1: one control hit by a gate-local transient (3x)
    // must not drag every solo baseline with it — the median of
    // {3.0, 1.0, 1.0} is 1.0, so the regressed gate stays a regression
    val flagged = Seq(("gate_x", 1.0, 3.0, 1.05))
    val out = Bench.adjudicateFlags(flagged, soloPanel,
      Map("gate_x" -> 2.9, "a1_multi_agg" -> 1.50, // control transient 3x
        "p6_isin" -> 0.40, "w2_lag" -> 0.60).apply)
    assert(out.head._4 === 1.0 && out.head._5 === "regression")
  }

  test("failed solo measures surface as solo_error, never a silent absolution") {
    val flagged = Seq(("gate_x", 1.0, 3.0, 1.05))
    // the gate itself fails all solo runs (-1 sentinel) → solo_error
    val g = Bench.adjudicateFlags(flagged, soloPanel,
      Map("gate_x" -> -1.0, "a1_multi_agg" -> 0.5, "p6_isin" -> 0.4,
        "w2_lag" -> 0.6).apply)
    assert(g.head._5 === "solo_error")
    // the WHOLE panel fails → ambient falls back to 1.0 and the gate's
    // own clean solo reading still adjudicates (no Infinity baseline)
    val c = Bench.adjudicateFlags(flagged, soloPanel,
      Map("gate_x" -> 2.9, "a1_multi_agg" -> -1.0, "p6_isin" -> -1.0,
        "w2_lag" -> -1.0).apply)
    assert(c.head._4 === 1.0 && c.head._5 === "regression")
    // one failed control just drops out of the median; an even-sized
    // remainder averages the two middles ({1.0, 2.5} -> 1.75), so a
    // single noisy survivor can't fully determine ambient and the
    // genuinely-slow gate stays a regression
    val d = Bench.adjudicateFlags(flagged, soloPanel,
      Map("gate_x" -> 2.9, "a1_multi_agg" -> -1.0, "p6_isin" -> 0.4,
        "w2_lag" -> 1.5).apply)
    assert(math.abs(d.head._4 - 1.75) < 1e-9 && d.head._5 === "regression")
  }

  test("solo verdict still applies the absolute 0.5s floor") {
    // tiny gate: 6x slower solo but only +0.25s — not a regression
    val out = Bench.adjudicateFlags(Seq(("tiny", 0.05, 0.40, 0.05)),
      soloPanel, Map("tiny" -> 0.30, "a1_multi_agg" -> 0.50,
        "p6_isin" -> 0.40, "w2_lag" -> 0.60).apply)
    assert(out.head._5 === "transient")
  }

  test("memMismatch binds the drift comparison to one heap envelope") {
    assert(Bench.memMismatch(Some(8192L), 98304L))   // 8g prev vs 96g cur
    assert(Bench.memMismatch(Some(98304L), 8192L))   // and the reverse
    assert(!Bench.memMismatch(Some(8192L), 8192L))
    assert(!Bench.memMismatch(Some(8192L), 9216L))   // +12% — same envelope
    assert(!Bench.memMismatch(None, 8192L))          // pre-r13 run: stay armed
  }

  test("parsePrevDriverMem reads the recorded heap; legacy runs None") {
    val line = """{"metric":"total","value":10.0,"cpus":"32","driver_mem_mb":7282,"queries":{"a":1.0}}"""
    assert(Bench.parsePrevDriverMem(line) === Some(7282L))
    assert(Bench.parsePrevDriverMem("""{"queries":{"a":1.0}}""") === None)
  }

  test("parsePrevDriverMem is anchored to the top-level field") {
    // r13 ADVICE item 4: a nested key spelled exactly "driver_mem_mb"
    // after "queries" (e.g. a future per-gate drift block) must not be
    // misread as the run's heap — only the pre-"queries" prefix binds
    val nestedOnly = """{"metric":"total","queries":{"a":1.0},"drifts":{"x":{"driver_mem_mb":91136}}}"""
    assert(Bench.parsePrevDriverMem(nestedOnly) === None)
    val both = """{"driver_mem_mb":8192,"queries":{"a":1.0},"drifts":{"x":{"driver_mem_mb":91136}}}"""
    assert(Bench.parsePrevDriverMem(both) === Some(8192L))
  }

  test("parsePrevQueries reads the BENCH_FULL line shape") {
    val line = """{"metric":"total","value":10.0,"unit":"sec","queries":{"a":0.5,"b":-1.000,"c":2.25},"errors":["b"],"sf":"x"}"""
    assert(Bench.parsePrevQueries(line) ==
      Map("a" -> 0.5, "b" -> -1.0, "c" -> 2.25))
    assert(Bench.parsePrevQueries("not json") == Map.empty)
  }
}
