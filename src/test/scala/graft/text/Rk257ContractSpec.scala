package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.util.{DuckBridgeTestUtil, DuckHash}

/** Pins the LAST DuckHash kernel without an executable contract
  * (r11 ADVICE residue): [[DuckHash.rk257Gram]] vs the production
  * [[TextAnalysis.rkGramHashes]] recurrence, by EXECUTION in a real
  * DuckDB. The production hash reads UTF-16 code units
  * (`s.charAt`), the SQL reads codepoints (`ord(substr(...))`) —
  * these are EQUAL for every Basic-Multilingual-Plane character, so
  * the true contract boundary is "BMP-only", wider than the
  * documented ASCII assumption (winnowing's corpus is ASCII by
  * construction, comfortably inside). The spec proves both sides of
  * the boundary: exact agreement at every gram position for
  * ASCII AND BMP-non-ASCII vectors, and REAL divergence on an astral
  * (surrogate-pair) vector — where lengths and positions shift, so a
  * violation cannot be silent at the winnowing fingerprint compare. */
class Rk257ContractSpec extends AnyFunSuite {
  import DuckBridgeTestUtil.{duck, duckAvailable, sq}

  private val rnd = new scala.util.Random(20260816L)
  private def asciiOf(n: Int): String =
    (0 until n).map(_ => (33 + rnd.nextInt(90)).toChar).mkString
      .replace('\'', 'q').replace('\\', 'z')

  private def sqlHashes(s: String, k: Int): Seq[Long] = {
    // position count from DuckDB's OWN length (codepoints) — for BMP
    // input it equals the UTF-16 count; for astral input it is the
    // divergence under test
    val rows = duck(
      s"""SELECT ${DuckHash.toSigned(DuckHash.rk257Gram("s", "p", k))}
         |FROM (SELECT ${sq(s)} AS s,
         |        unnest(generate_series(1, length(${sq(s)}) - ${k - 1}))
         |          AS p)
         |ORDER BY p""".stripMargin)
    rows.map(r => r.head.get.toLong)
  }

  test("BMP input: SQL gram hashes equal the production recurrence at every position") {
    assume(duckAvailable, "python3+duckdb bridge not present")
    val vectors = Seq(
      asciiOf(8), asciiOf(15), asciiOf(40),
      "the quick brown fox jumps",
      "café naïve déjà-vu ÿ",   // BMP non-ASCII: unit == codepoint
      "日本語テキストの窓処理") // CJK is BMP too
    for (k <- Seq(3, 8); s <- vectors if s.length >= k) {
      val want = TextAnalysis.rkGramHashes(s, k).toSeq
      assert(sqlHashes(s, k) === want, s"k=$k s=$s")
    }
  }

  test("astral input diverges LOUDLY (length shift), pinning the BMP boundary") {
    assume(duckAvailable, "python3+duckdb bridge not present")
    val s = "ab𝄞cd" // 𝄞 = one codepoint, TWO UTF-16 units
    val k = 3
    val want = TextAnalysis.rkGramHashes(s, k).toSeq // over 6 units
    // DuckDB sees 5 codepoints → one FEWER gram, and surrogate-unit
    // arithmetic differs from codepoint arithmetic: the contract
    // violation surfaces as a structural mismatch, never a silently
    // equal hash stream
    val got = sqlHashes(s, k)
    assert(got.size === want.size - 1)
    assert(got !== want.take(got.size))
  }
}
