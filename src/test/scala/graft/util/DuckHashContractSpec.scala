package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Pins DuckHash's string-input contract by EXECUTION, not scaladoc
  * (r11 verdict nit 3): the generated DuckDB SQL for the two string
  * hashes must return
  *
  *  - the EXACT engine hash for in-contract input (ASCII; < 32 chars
  *    for the xxhash64 no-stripe form) — compared against Spark's own
  *    `xxhash64(...)` and the production `MinHashLsh.fnv1a64`, and
  *  - NULL for out-of-contract input (≥ 32 chars, or non-ASCII where
  *    codepoints ≠ UTF-8 bytes) — a LOUD oracle mismatch, never a
  *    silently wrong hash.
  *
  * Vectors are generator-built (seeded, deterministic): random ASCII
  * at every tail-path length class (0, <4, <8, 8..31 — word loop +
  * 4-byte step + byte tail), the 32/33/64-char long path, and
  * non-ASCII in both the 2-byte and 3-byte UTF-8 classes. The SQL
  * runs in a real DuckDB via the python3 bridge the oracle harness
  * itself uses; if that bridge is absent the spec cancels (assume)
  * rather than passing vacuously.
  */
class DuckHashContractSpec extends AnyFunSuite {

  import DuckBridgeTestUtil.{duck, duckAvailable, sq}

  // deterministic generator: printable ASCII without the quote-escape
  // classes, covering every xxhash64 tail-path length
  private val rnd = new scala.util.Random(42)
  private def asciiOf(n: Int): String =
    (0 until n).map(_ => (33 + rnd.nextInt(90)).toChar).mkString
      .replace('\'', 'q').replace('\\', 'z')
  private val inContract: Seq[String] =
    Seq("", "a", "ab", "abc") ++
      Seq(4, 5, 7, 8, 9, 12, 15, 16, 17, 23, 24, 25, 31).map(asciiOf) ++
      (1 to 20).map(_ => asciiOf(1 + rnd.nextInt(31)))
  private val tooLong: Seq[String] = Seq(32, 33, 40, 64).map(asciiOf)
  private val nonAscii: Seq[String] =
    Seq("café", "naïve", "ÿ", "日本語",
      "mixed€mid", "é" * 31)

  test("in-contract strings: generated SQL equals the engine hashes") {
    assume(duckAvailable, "python3+duckdb bridge not present")
    val spark = graft.SparkTestBase.spark
    val expectXxh = inContract.map { s =>
      spark.sql(s"SELECT xxhash64(${sq(s)})").head().getLong(0)
    }
    val expectFnv = inContract.map(graft.text.MinHashLsh.fnv1a64)
    val values = inContract.map(s => s"(${sq(s)})").mkString(", ")
    val got = duck(
      s"""SELECT ${DuckHash.toSigned(DuckHash.xxhash64String("s", "42::HUGEINT"))},
         |       ${DuckHash.toSigned(DuckHash.fnv1a64String("s"))}
         |FROM (VALUES $values) t(s)""".stripMargin)
    assert(got.size == inContract.size)
    inContract.indices.foreach { i =>
      assert(got(i)(0).contains(expectXxh(i).toString),
        s"xxhash64 mismatch on ${inContract(i)}: got ${got(i)(0)}")
      assert(got(i)(1).contains(expectFnv(i).toString),
        s"fnv1a64 mismatch on ${inContract(i)}: got ${got(i)(1)}")
    }
  }

  test("out-of-contract strings NULL out loudly, never hash wrong") {
    assume(duckAvailable, "python3+duckdb bridge not present")
    val values = (tooLong ++ nonAscii).map(s => s"(${sq(s)})").mkString(", ")
    val got = duck(
      s"""SELECT ${DuckHash.toSigned(DuckHash.xxhash64String("s", "42::HUGEINT"))},
         |       ${DuckHash.toSigned(DuckHash.fnv1a64String("s"))}
         |FROM (VALUES $values) t(s)""".stripMargin)
    assert(got.size == tooLong.size + nonAscii.size)
    // xxhash64String: every out-of-contract class is NULL
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r(0).isEmpty,
        s"xxhash64String must NULL out-of-contract input #$i, got ${r(0)}")
    }
    // fnv1a64String: length-unbounded, so long ASCII still hashes
    // (and must match the engine); non-ASCII is NULL
    tooLong.indices.foreach { i =>
      assert(got(i)(1).contains(
        graft.text.MinHashLsh.fnv1a64(tooLong(i)).toString))
    }
    nonAscii.indices.foreach { i =>
      val r = got(tooLong.size + i)
      assert(r(1).isEmpty,
        s"fnv1a64String must NULL non-ASCII input ${nonAscii(i)}, got ${r(1)}")
    }
  }
}
