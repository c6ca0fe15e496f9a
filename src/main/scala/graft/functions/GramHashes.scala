package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared n-gram HASH kernel behind [[CodepointGramHashes]] and
  * [[WordGramHashes]] — all window hashes of ALL orders `minN..maxN`
  * in one pass over the input, O(1) per (position, order) via prefix
  * polynomial hashes, zero per-gram allocation.
  *
  * This is the r13-deferred "codepoint-stepping rolling hash"
  * (PLANS_NOTES r13.10): the [[RollingHashGrams]] kernel reads UTF-16
  * code units, which would silently narrow the eval family's
  * full-Unicode codepoint contract to the BMP (an astral char is TWO
  * code units there, so its windows de-synchronize from the oracle's
  * codepoint `substr` grams). Here the string is decoded to CODEPOINTS
  * first (surrogate pairs collapse to one symbol), so window
  * boundaries agree with DuckDB `substr`/Spark `substring` on the full
  * Unicode domain — proven against the substring spelling on
  * astral-plane fixtures in GramHashesSpec.
  *
  * Hash construction: prefix polynomial P[i] = P[i−1]·B + (sym+1)
  * (wrapping 64-bit), window [p, p+n) = P[p+n] − P[p]·B^n, finalized
  * through the murmur fmix64 avalanche (the prefix-difference raw
  * value has structured low bits; fmix64 gives uniform 64). Each
  * element packs (fmix64(window) << 4) | (tag << 3) | n — the order
  * rides in the low 3 bits (so maxN ≤ 7) plus one caller TAG bit (so
  * two gram FAMILIES can meet in one exploded array without structs:
  * chrF++ concats char grams tagged 0 with word grams tagged 1 and
  * explodes plain longs), leaving a 60-bit hash: the same negligible
  * -collision currency class as the xxhash64 the eval pipelines
  * previously shuffled, at O(1) per gram instead of a substring
  * allocation + byte hash per gram. Downstream recovers `e & 7` (the
  * order, single-family) or `e & 15` (tag·8 + order, mixed-family)
  * and groups by the packed value itself.
  */
object GramHash {
  /** Polynomial base for window combination (FNV-64 prime). */
  private val B = 1099511628211L
  /** Polynomial base for per-word char hashing (distinct from B so a
    * word's internal structure and the window structure never share
    * algebra). */
  private val B2 = 1000003L

  /** murmur3 fmix64 finalizer — public static for generated code. */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  /** Shared windowing: packed (fmix64(window)<<4)|(tag<<3)|n for all
    * orders minN..min(maxN, #syms) over the symbol-hash array. */
  private def windows(sym: Array[Long], nSyms: Int,
      minN: Int, maxN: Int, tag: Int): Array[Long] = {
    val hi = math.min(maxN, nSyms)
    if (hi < minN) return Array.emptyLongArray
    val pref = new Array[Long](nSyms + 1)
    var j = 0
    while (j < nSyms) { pref(j + 1) = pref(j) * B + sym(j); j += 1 }
    // element count in a Long: ~(maxN − minN + 1)·nSyms can pass
    // Int.MaxValue for a single multi-hundred-MB string, and an Int
    // accumulator would wrap to a NegativeArraySizeException — fail
    // with the actual bound instead
    var total = 0L
    var n = minN
    while (n <= hi) { total += nSyms - n + 1; n += 1 }
    if (total > Int.MaxValue) throw new IllegalArgumentException(
      s"gram_hashes: one row would emit $total window hashes " +
        s"(orders $minN..$hi over $nSyms symbols) — exceeds the " +
        s"2^31-1 per-row array bound; split the document upstream")
    val out = new Array[Long](total.toInt)
    var bn = 1L
    var k = 0
    while (k < minN - 1) { bn *= B; k += 1 }
    val tagged = (tag.toLong << 3)
    var idx = 0
    n = minN
    while (n <= hi) {
      bn *= B // B^n
      var p = 0
      while (p + n <= nSyms) {
        out(idx) = (fmix64(pref(p + n) - pref(p) * bn) << 4) | tagged | n
        idx += 1; p += 1
      }
      n += 1
    }
    out
  }

  /** Array core of the codepoint face — the SAME symbol construction
    * and windowing as the expression path (which wraps this), exposed
    * for the per-pair typed counting kernels so the gram currency is
    * bit-identical whether it flows through a Generate or a local
    * count map. */
  def codepointGramArray(str: String, minN: Int, maxN: Int,
      tag: Int): Array[Long] = {
    val len = str.length
    val cps = new Array[Long](len)
    var nSyms = 0
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(nSyms) = cp + 1L
      nSyms += 1
      i += Character.charCount(cp)
    }
    windows(cps, nSyms, minN, maxN, tag)
  }

  /** Array core of the word face over already-split words (null words
    * hash like "", mirroring the ArrayData face). */
  def wordGramArray(ws: Array[String], minN: Int, maxN: Int,
      tag: Int): Array[Long] = {
    val nw = ws.length
    val wh = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      var h = 1L
      val w = ws(i)
      if (w != null) {
        var j = 0
        while (j < w.length) { h = h * B2 + w.charAt(j); j += 1 }
      }
      wh(i) = fmix64(h)
      i += 1
    }
    windows(wh, nw, minN, maxN, tag)
  }

  /** Codepoint-gram face: symbols are Unicode CODEPOINTS (+1, so
    * U+0000 is non-degenerate). Called from generated code. */
  def codepointGrams(s: UTF8String, minN: Int, maxN: Int, tag: Int): ArrayData =
    new GenericArrayData(codepointGramArray(s.toString, minN, maxN, tag))

  /** Word-gram face: symbols are per-word hashes (char polynomial
    * seeded 1 through fmix64 — "" hashes to fmix64(1), never 0, so an
    * empty split token is a real symbol). Null array slots hash like
    * "" (split() never emits nulls; belt-and-braces for hand-built
    * arrays). Called from generated code. */
  def wordGrams(arr: ArrayData, minN: Int, maxN: Int, tag: Int): ArrayData = {
    val nw = arr.numElements()
    val ws = new Array[String](nw)
    var i = 0
    while (i < nw) {
      if (!arr.isNullAt(i)) ws(i) = arr.getUTF8String(i).toString
      i += 1
    }
    new GenericArrayData(wordGramArray(ws, minN, maxN, tag))
  }
}

/** Base for the two gram-hash expressions: array<bigint> of packed
  * (hash<<4)|(tag<<3)|order window hashes, orders `minN..maxN` (1 ≤
  * minN ≤ maxN ≤ 7 — 3 packing bits; tag ∈ {0, 1}). Codegen calls the
  * same static kernel as the interpreted path, so the two can never
  * diverge, and the call fuses into the surrounding whole-stage
  * -codegen span (no object-encoder boundary). */
sealed abstract class GramHashesBase extends UnaryExpression {
  def minN: Int
  def maxN: Int
  def tag: Int
  protected def fnName: String
  protected def childTypeOk: Boolean

  override def checkInputDataTypes(): TypeCheckResult =
    if (childTypeOk && minN >= 1 && minN <= maxN && maxN <= 7
        && tag >= 0 && tag <= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fnName expects (input, 1 <= minN <= maxN <= 7, tag in 0..1), " +
        s"got (${child.dataType.simpleString}, $minN, $maxN, $tag)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** All codepoint n-gram hashes of orders minN..maxN, packed — the
  * chrF gram currency (full-Unicode windows, see [[GramHash]]). */
case class CodepointGramHashes(child: Expression, minN: Int, maxN: Int,
    tag: Int = 0) extends GramHashesBase {
  override protected def fnName: String = "cp_gram_hashes"
  override protected def childTypeOk: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    GramHash.codepointGrams(input.asInstanceOf[UTF8String], minN, maxN, tag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHash.codepointGrams($c, $minN, $maxN, $tag);")

  override protected def withNewChildInternal(
      newChild: Expression): CodepointGramHashes = copy(child = newChild)
}

/** All word n-gram hashes of orders minN..maxN over a split word
  * array, packed — the BLEU gram currency. */
case class WordGramHashes(child: Expression, minN: Int, maxN: Int,
    tag: Int = 0) extends GramHashesBase {
  override protected def fnName: String = "word_gram_hashes"
  override protected def childTypeOk: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    GramHash.wordGrams(input.asInstanceOf[ArrayData], minN, maxN, tag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHash.wordGrams($c, $minN, $maxN, $tag);")

  override protected def withNewChildInternal(
      newChild: Expression): WordGramHashes = copy(child = newChild)
}

object GramHashes {
  private[functions] def lit(e: Expression, what: String): Int =
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => sys.error(s"$what must be an int literal, got $other")
    }

  private def tagOf(es: Seq[Expression], name: String): Int =
    if (es.size >= 4) lit(es(3), s"$name tag") else 0

  /** The ONE argument-wiring spelling for `cp_gram_hashes(s, minN,
    * maxN[, tag])` — shared by the session registry and the
    * SparkSessionExtensions injector so the two routes can never
    * diverge. */
  val cpBuilder: Seq[Expression] => Expression = es =>
    CodepointGramHashes(
      es.head, lit(es(1), "cp_gram_hashes minN"),
      lit(es(2), "cp_gram_hashes maxN"), tagOf(es, "cp_gram_hashes"))

  /** Same for `word_gram_hashes(ws, minN, maxN[, tag])`. */
  val wordBuilder: Seq[Expression] => Expression = es =>
    WordGramHashes(
      es.head, lit(es(1), "word_gram_hashes minN"),
      lit(es(2), "word_gram_hashes maxN"), tagOf(es, "word_gram_hashes"))

  /** Register both functions (bounds foldable int literals) in the
    * session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cp_gram_hashes", cpBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_gram_hashes", wordBuilder, "scala_udf")
  }
}
