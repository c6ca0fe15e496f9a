package graft.f1

import org.scalatest.funsuite.AnyFunSuite

/** Plan exhibit for the `f1_e2e_serving` gate: the E3 serving
  * lifecycle (pruned read → slice → scale → windows → inference →
  * union) must stay ONE lazy plan with partition pruning intact all
  * the way to the scans — the property the gate's hash can't see. */
class ServingE2ESpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def servingPlan: String = {
    val df = graft.SparkEntry.queries("f1_e2e_serving")(
      spark, "/root/testdata/sf0.001")
    df.queryExecution.executedPlan.toString
  }

  test("partition pruning survives the composed serving plan") {
    val plan = servingPlan
    // both branches of the human/AI union read the warehouse through
    // the same pruned (year, round) scan
    val pruned = "PartitionFilters: \\[[^\\]]*(year|Year)".r
      .findAllIn(plan).size
    assert(pruned >= 1, s"expected a year/round-pruned scan in:\n$plan")
    assert(!plan.contains("PartitionFilters: []"),
      s"found an UNPRUNED warehouse scan in the serving plan:\n$plan")
  }

  test("the lifecycle is one plan: union of human scan and inference branch") {
    val plan = servingPlan
    assert(plan.contains("Union"), "human/AI union present")
    // the inference hook runs as a deserialized mapPartitions stage
    // inside the same plan, not a separate materialization
    assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
      s"inference stage not found in plan:\n$plan")
    assert(plan.contains("Window"), "sequence-window stage present")
  }
}
