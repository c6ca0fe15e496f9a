package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("bloom-pruned join equals the plain join and actually prunes") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // 10-key dimension: high fact selectivity, so pruning must bite
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_custkey") % 150 === 0)
      .select(col("c_custkey"), col("c_acctbal"))
    val nDim = dim.count()
    assert(nDim > 0 && nDim <= 15)

    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val pruned = BloomJoin.pruned(orders, dim, "o_custkey", "c_custkey",
        expected = nDim)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(pruned === plain) // exact: no false negatives, fpp dies in join

    // effectiveness: the scan survivor count is matches + ~fpp·total,
    // far below the full fact table
    val total = orders.count()
    val matches = orders.join(dim, col("o_custkey") === col("c_custkey")).count()
    val survivors = BloomJoin.prunedScan(orders, dim, "o_custkey",
      "c_custkey", expected = nDim).count()
    assert(survivors >= matches)
    assert(survivors <= matches + (0.05 * total).toLong,
      s"bloom passed $survivors of $total (matches $matches)")
  }
}
