package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Executed contract for the fixed-point log2 CTE pipeline: the SQL
  * [[DuckHash.log2fpRowCtes]] generates (and the scalar-tot
  * [[DuckHash.log2fpCtes]] delegates to) runs in a REAL DuckDB and
  * must land the same integer as [[FixedLog.log2fp]] on every row —
  * the same execute-don't-trust pin the xxhash64/fnv/RK-257 kernels
  * carry in DuckHashContractSpec. Before r13 only the Scala spelling
  * had unit coverage; a stage-chaining typo in the CTE builder would
  * have passed `sbt test` and broken five oracle gates at Verify
  * time. */
class Log2fpContractSpec extends AnyFunSuite {

  test("log2fpRowCtes executes in DuckDB and matches FixedLog.log2fp per row") {
    assume(DuckBridgeTestUtil.duckAvailable)
    // sweep: exact powers, off-by-ones, equal val/tot (log 0), val 1
    // (most negative), coprime ratios, large magnitudes — per-row tots
    val cases: Seq[(Long, Long)] = Seq(
      1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 5L, 5L -> 8L,
      1L -> 1024L, 7L -> 1024L, 1023L -> 1024L, 1024L -> 1024L,
      693L -> 1000L, 123456L -> 999999L, 1L -> 1000000007L,
      999999999L -> 1000000000L, (1L << 40) -> ((1L << 40) + 1L),
      ((1L << 40) - 7L) -> (1L << 45))
    val rows = cases.zipWithIndex
      .map { case ((c, t), i) => s"($i, $c, $t)" }.mkString(", ")
    val (ctes, last) = DuckHash.log2fpRowCtes(
      "lsrc", Seq("id"), "v", "t", "lg")
    val sql =
      s"""WITH lsrc AS (SELECT * FROM (VALUES $rows) s(id, v, t))$ctes
         |SELECT id, ql FROM $last ORDER BY id""".stripMargin
    val got = DuckBridgeTestUtil.duck(sql)
      .map(r => r(0).get.toInt -> r(1).get.toLong).toMap
    cases.zipWithIndex.foreach { case ((c, t), i) =>
      assert(got(i) === FixedLog.log2fp(c, t),
        s"log2fp($c, $t): duck ${got(i)} vs scala")
    }
    // the scalar-tot delegation (the HllKernel/UnigramLm shape): one
    // shared tot CTE, same integers
    val (ctes2, last2) = DuckHash.log2fpCtes(
      "l2src", "id", "v", "l2tot", "l2g")
    val sql2 =
      s"""WITH l2src AS (SELECT * FROM (VALUES (0, 1), (1, 7), (2, 1023),
         |  (3, 1024)) s(id, v)),
         |l2tot AS (SELECT 1024 AS tot)$ctes2
         |SELECT id, ql FROM $last2 ORDER BY id""".stripMargin
    val got2 = DuckBridgeTestUtil.duck(sql2)
      .map(r => r(0).get.toInt -> r(1).get.toLong).toMap
    Seq(1L, 7L, 1023L, 1024L).zipWithIndex.foreach { case (c, i) =>
      assert(got2(i) === FixedLog.log2fp(c, 1024L), s"scalar-tot $c")
    }
  }
}
