package graft.text

import graft.functions.GramHash

/** Local gram-count map for the per-pair eval metrics (r15
  * optimization): the (pair, gram) hash aggregations of the BLEU /
  * chrF / ROUGE-n / token-F1 family only ever combine rows of the SAME
  * pair, so once both sides' texts meet in one row (one lightweight
  * pair shuffle — the DP-metric pattern, guide §2.3/§8: move the small
  * proxy, not the 6-9×-wider gram stream), the clipped/total counts
  * can be computed locally with an open-addressing map keyed by the
  * SAME packed gram hash the distributed aggregation grouped by
  * ([[GramHash]] — one static kernel, so collision behavior and
  * therefore every count is bit-identical to the exploded spelling).
  *
  * Key 0 is the empty-slot sentinel — a packed gram is never 0 (its
  * low bits carry the order n ≥ 1 or the token-F1 marker tag 8). Up
  * to three count columns: side 0 = candidate / system A, side 1 =
  * reference, side 2 = system B (the paired-bootstrap quads). One
  * instance is reused across rows within a partition (reset clears
  * only the touched slots).
  */
private[text] final class GramCountMap {
  private var logCap = 12
  private var cap = 1 << logCap
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var c0 = new Array[Long](cap)
  private var c1 = new Array[Long](cap)
  private var c2 = new Array[Long](cap)
  private var slots = new Array[Int](cap)
  private var nSlots = 0

  def size: Int = nSlots
  def keyAt(i: Int): Long = keys(slots(i))
  def count0At(i: Int): Long = c0(slots(i))
  def count1At(i: Int): Long = c1(slots(i))
  def count2At(i: Int): Long = c2(slots(i))

  def reset(): Unit = {
    var i = 0
    while (i < nSlots) {
      val s = slots(i)
      keys(s) = 0L; c0(s) = 0L; c1(s) = 0L; c2(s) = 0L
      i += 1
    }
    nSlots = 0
  }

  private def find(k: Long): Int = {
    var idx = ((k * 0x9E3779B97F4A7C15L) >>> (64 - logCap)).toInt
    while (keys(idx) != 0L && keys(idx) != k) idx = (idx + 1) & mask
    idx
  }

  private def grow(): Unit = {
    val oldKeys = keys; val o0 = c0; val o1 = c1; val o2 = c2
    val oldSlots = slots; val oldN = nSlots
    logCap += 1; cap = 1 << logCap; mask = cap - 1
    keys = new Array[Long](cap); c0 = new Array[Long](cap)
    c1 = new Array[Long](cap); c2 = new Array[Long](cap)
    slots = new Array[Int](cap); nSlots = 0
    var i = 0
    while (i < oldN) {
      val s = oldSlots(i)
      val k = oldKeys(s)
      val idx = find(k)
      keys(idx) = k; c0(idx) = o0(s); c1(idx) = o1(s); c2(idx) = o2(s)
      slots(nSlots) = idx; nSlots += 1
      i += 1
    }
  }

  private def ensure(extra: Int): Unit = {
    var need = nSlots.toLong + extra
    while (need > cap / 2) { grow(); need = nSlots.toLong + extra }
  }

  /** +1 on count column `side` for every gram in `grams`. */
  def add(grams: Array[Long], side: Int): Unit = {
    ensure(grams.length)
    var i = 0
    while (i < grams.length) {
      val k = grams(i)
      val idx = find(k)
      if (keys(idx) == 0L) { keys(idx) = k; slots(nSlots) = idx; nSlots += 1 }
      side match {
        case 0 => c0(idx) += 1L
        case 1 => c1(idx) += 1L
        case _ => c2(idx) += 1L
      }
      i += 1
    }
  }

  /** count column 1 (reference) of key `k` := max(current, v) — the
    * Papineni multi-reference clip accumulator. */
  def maxInto1(k: Long, v: Long): Unit = {
    ensure(1)
    val idx = find(k)
    if (keys(idx) == 0L) { keys(idx) = k; slots(nSlots) = idx; nSlots += 1 }
    if (v > c1(idx)) c1(idx) = v
  }
}

/** Per-pair counting kernels over the shared [[GramHash]] currency —
  * the local twins of the (key, n, gram) → (key, n) conditional-sum
  * aggregations they replace. Each emitter returns exactly the rows
  * the distributed form produced: one (n, ...) row per gram order
  * populated on ANY side, counts identical by construction (same
  * packed hashes, same min/sum algebra). */
private[text] object PairGramKernel {

  /** Spark's `split(text, ' ')` (java regex split, limit -1 — trailing
    * empty tokens KEPT; `""` splits to `[""]`). */
  def splitWs(text: String): Array[String] = text.split(" ", -1)

  /** Spark's `regexp_replace(text, " ", "")`. */
  def strip(text: String): String = text.replace(" ", "")

  /** Spark's `xxhash64(text)` (seed 42). */
  def xxh64(text: String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(text), 42L)

  /** (n, clipped, c_total, r_total) rows for a two-sided pair from
    * pre-computed gram arrays (either may be empty = absent side). */
  def pairCounts(m: GramCountMap, cGrams: Array[Long],
      rGrams: Array[Long]): List[(Int, Long, Long, Long)] = {
    m.reset()
    m.add(cGrams, 0)
    m.add(rGrams, 1)
    val clipped = new Array[Long](16)
    val ct = new Array[Long](16)
    val rt = new Array[Long](16)
    var seen = 0
    var i = 0
    while (i < m.size) {
      val n = (m.keyAt(i) & 15L).toInt
      val c = m.count0At(i)
      val r = m.count1At(i)
      clipped(n) += math.min(c, r); ct(n) += c; rt(n) += r
      seen |= 1 << n
      i += 1
    }
    var out: List[(Int, Long, Long, Long)] = Nil
    var n = 15
    while (n >= 0) {
      if ((seen & (1 << n)) != 0) out = (n, clipped(n), ct(n), rt(n)) :: out
      n -= 1
    }
    out
  }

  /** (n, clipped_a, clipped_b, a_total, b_total, r_total) rows for a
    * paired-bootstrap quad (system A / system B clipped against the
    * shared reference). */
  def quadCounts(m: GramCountMap, aGrams: Array[Long], bGrams: Array[Long],
      rGrams: Array[Long]): List[(Int, Long, Long, Long, Long, Long)] = {
    m.reset()
    m.add(aGrams, 0)
    m.add(rGrams, 1)
    m.add(bGrams, 2)
    val clA = new Array[Long](16); val clB = new Array[Long](16)
    val aT = new Array[Long](16); val bT = new Array[Long](16)
    val rT = new Array[Long](16)
    var seen = 0
    var i = 0
    while (i < m.size) {
      val n = (m.keyAt(i) & 15L).toInt
      val a = m.count0At(i); val r = m.count1At(i); val b = m.count2At(i)
      clA(n) += math.min(a, r); clB(n) += math.min(b, r)
      aT(n) += a; bT(n) += b; rT(n) += r
      seen |= 1 << n
      i += 1
    }
    var out: List[(Int, Long, Long, Long, Long, Long)] = Nil
    var n = 15
    while (n >= 0) {
      if ((seen & (1 << n)) != 0)
        out = (n, clA(n), clB(n), aT(n), bT(n), rT(n)) :: out
      n -= 1
    }
    out
  }

  /** (n, clipped, c_total) rows for one candidate against SEVERAL
    * references with the Papineni max-per-gram clip: the reference
    * count of a gram is its MAX count across the references (`ref` is
    * a scratch map for the per-reference counts). Only orders the
    * CANDIDATE populates emit (the bleu4MultiRef `c_total >= 1`
    * contract). */
  def multiRefClippedCounts(m: GramCountMap, ref: GramCountMap,
      cGrams: Array[Long],
      refGrams: Iterator[Array[Long]]): List[(Int, Long, Long)] = {
    m.reset()
    m.add(cGrams, 0)
    refGrams.foreach { g =>
      ref.reset()
      ref.add(g, 0)
      var i = 0
      while (i < ref.size) {
        m.maxInto1(ref.keyAt(i), ref.count0At(i))
        i += 1
      }
    }
    val clipped = new Array[Long](16)
    val ct = new Array[Long](16)
    var seen = 0
    var i = 0
    while (i < m.size) {
      val n = (m.keyAt(i) & 15L).toInt
      val c = m.count0At(i)
      if (c >= 1) {
        clipped(n) += math.min(c, m.count1At(i))
        ct(n) += c
        seen |= 1 << n
      }
      i += 1
    }
    var out: List[(Int, Long, Long)] = Nil
    var n = 15
    while (n >= 0) {
      if ((seen & (1 << n)) != 0) out = (n, clipped(n), ct(n)) :: out
      n -= 1
    }
    out
  }

  /** Char grams (orders 1..maxN over the space-stripped text, tag 0);
    * empty after stripping (or NULL) = absent side = empty array. */
  def charGrams(text: String, maxN: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val s = strip(text)
    if (s.isEmpty) Array.emptyLongArray
    else GramHash.codepointGramArray(s, 1, maxN, 0)
  }

  /** Word grams (orders minN..maxN over split(text, ' '), tag
    * `tag`); NULL text = absent side. */
  def wordGrams(text: String, minN: Int, maxN: Int, tag: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    GramHash.wordGramArray(splitWs(text), minN, maxN, tag)
  }

  /** chrF++ mixed-family grams: char orders (tag 0) + word orders
    * (tag 1), both ABSENT when the stripped text is empty (the
    * `length(s) >= 1` row filter of the exploded spelling applied to
    * the whole side, word family included). */
  def chrFppGrams(text: String, maxN: Int, wordN: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val s = strip(text)
    if (s.isEmpty) return Array.emptyLongArray
    val chars = GramHash.codepointGramArray(s, 1, maxN, 0)
    val words = GramHash.wordGramArray(splitWs(text), 1, wordN, 1)
    val out = new Array[Long](chars.length + words.length)
    System.arraycopy(chars, 0, out, 0, chars.length)
    System.arraycopy(words, 0, out, chars.length, words.length)
    out
  }

  /** token-F1 grams: word unigrams (packed n = 1) + the whole-text
    * marker (xxhash64 <<4 | 8 — the tagged element the exploded
    * spelling rode); NULL text = absent side. */
  def tokenF1Grams(text: String): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val uni = GramHash.wordGramArray(splitWs(text), 1, 1, 0)
    val out = new Array[Long](uni.length + 1)
    System.arraycopy(uni, 0, out, 0, uni.length)
    out(uni.length) = (xxh64(text) << 4) | 8L
    out
  }
}
