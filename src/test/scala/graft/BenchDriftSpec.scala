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

  test("uniform ambient slowdown flags nothing") {
    val prev = controls ++ Map("expensive_gate" -> 4.0)
    val cur = prev.view.mapValues(_ * 1.6).toMap // whole machine 1.6x slower
    val (ambient, flagged) = Bench.driftFlags(prev, cur)
    assert(math.abs(ambient - 1.6) < 1e-9)
    assert(flagged.isEmpty)
  }

  test("a real regression is flagged with its normalized baseline") {
    val prev = controls ++ Map("regressed" -> 2.0, "steady" -> 3.0)
    val cur = prev.map { case (k, v) =>
      k -> (if (k == "regressed") v * 3 else v * 1.1) }
    val (ambient, flagged) = Bench.driftFlags(prev, cur)
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

  test("too few controls disables normalization instead of guessing") {
    val prev = Map("a1_multi_agg" -> 0.5, "other" -> 5.0)
    val cur = Map("a1_multi_agg" -> 1.0, "other" -> 20.0)
    val (ambient, flagged) = Bench.driftFlags(prev, cur)
    assert(ambient == 1.0 && flagged.isEmpty)
  }

  test("localDriftFilter clears gates that ran during a load stretch") {
    // 60 gates, canary every 20 → checkpoints at 0,20,40 + end = 4
    val gates = (0 until 60).map(i => f"g$i%02d")
    val prev = gates.map(_ -> 1.0).toMap
    // gates 20..39 ran during a 2x load stretch; canaries sampled at
    // positions 0/20/40/end read 1x, 2x, 2x, 1x
    val cur = gates.zipWithIndex.map { case (g, i) =>
      g -> (if (i >= 20 && i < 40) 2.0 else 1.0) }
    val prevCanary = Seq(0.3, 0.3, 0.3, 0.3)
    val curCanary = Seq(0.3, 0.6, 0.6, 0.3)
    val survives = Bench.localDriftFilter(prev, cur, prevCanary, curCanary,
      period = 20)
    // every 2x gate is bracketed by a 2x canary ratio → none survive
    assert(gates.slice(20, 40).forall(!survives(_)))
  }

  test("localDriftFilter keeps a real regression even near a load stretch") {
    val gates = (0 until 40).map(i => f"g$i%02d")
    val prev = gates.map(_ -> 1.0).toMap
    val cur = gates.zipWithIndex.map { case (g, i) =>
      g -> (if (g == "g25") 5.0 else if (i >= 20) 1.8 else 1.0) }
    val prevCanary = Seq(0.3, 0.3, 0.3)
    val curCanary = Seq(0.3, 0.55, 0.55) // local ambient ~1.83x
    val survives = Bench.localDriftFilter(prev, cur, prevCanary, curCanary,
      period = 20)
    assert(survives("g25"))          // 5x >> 1.3 * 1.83x
    assert(!survives("g30"))         // 1.8x == ambient, cleared
  }

  test("localDriftFilter without canary data filters nothing") {
    val cur = Seq("a" -> 9.0)
    assert(Bench.localDriftFilter(Map("a" -> 1.0), cur, Seq.empty, Seq.empty)
      == Set("a"))
  }

  test("parsePrevCanary reads the canary array") {
    val line = """{"queries":{"a":1.0},"canary_period":20,"canary":[0.210,0.315,0.220]}"""
    assert(Bench.parsePrevCanary(line) == Seq(0.21, 0.315, 0.22))
    assert(Bench.parsePrevCanary("""{"queries":{"a":1.0}}""") == Seq.empty)
  }

  test("parsePrevQueries reads the BENCH_FULL line shape") {
    val line = """{"metric":"total","value":10.0,"unit":"sec","queries":{"a":0.5,"b":-1.000,"c":2.25},"errors":["b"],"sf":"x"}"""
    assert(Bench.parsePrevQueries(line) ==
      Map("a" -> 0.5, "b" -> -1.0, "c" -> 2.25))
    assert(Bench.parsePrevQueries("not json") == Map.empty)
  }
}
