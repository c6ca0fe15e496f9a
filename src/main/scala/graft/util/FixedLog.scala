package graft.util

/** Exact fixed-point base-2 logarithm — the shared integer kernel
  * behind the unigram-LM quantized EM twin and the HLL kernel's
  * linear-counting estimator. Computes ≈ log2(c/t)·2^fbits for
  * 1 ≤ c ≤ t with every step an integer shift/compare/multiply plus
  * one integer division, so Scala and the DuckDB CTE spelling
  * ([[DuckHash.log2fpCtes]]) land the SAME integer — no float enters
  * on either side (validated 0/834 prototype mismatches; pinned by
  * HllKernelSpec's exhaustive sweep over the full LC domain).
  *
  * Algorithm: greedy binary normalization of c into [t, 2t) counting
  * doublings e, one 31-bit fixed-point mantissa division, then
  * `fbits` squaring steps each emitting one result bit; the return is
  * res − e·2^fbits ≤ 0.
  */
object FixedLog {

  def log2fp(c: Long, t: Long, fbits: Int = 20): Long = {
    require(c >= 1 && t >= c, s"log2fp domain: 1 <= $c <= $t")
    var num = BigInt(c); val tt = BigInt(t)
    var e = 0L
    Seq(32, 16, 8, 4, 2, 1).foreach { k =>
      if ((num << k) < tt) { num = num << k; e += k }
    }
    if (num < tt) { num = num << 1; e += 1 }
    var m = (num << 31) / tt
    var res = 0L
    var i = 0
    while (i < fbits) {
      m = (m * m) >> 31
      res <<= 1
      if (m >= (BigInt(1) << 32)) { m = m >> 1; res += 1 }
      i += 1
    }
    res - (e << fbits)
  }
}
