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

  test("parsePrevQueries reads the BENCH_FULL line shape") {
    val line = """{"metric":"total","value":10.0,"unit":"sec","queries":{"a":0.5,"b":-1.000,"c":2.25},"errors":["b"],"sf":"x"}"""
    assert(Bench.parsePrevQueries(line) ==
      Map("a" -> 0.5, "b" -> -1.0, "c" -> 2.25))
    assert(Bench.parsePrevQueries("not json") == Map.empty)
  }
}
