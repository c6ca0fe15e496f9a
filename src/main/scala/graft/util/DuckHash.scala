package graft.util

/** DuckDB spellings of the engine's PRODUCTION hash functions — the
  * round-11 discovery that retires "md5 is the only cross-engine
  * uniform": Spark's `xxhash64` (XXH64, seed-chained per field), the
  * fnv1a64 word hash, and the Rabin–Karp base-257 rolling gram hash
  * are all fixed sequences of u64 multiplies/rotates/xors, and DuckDB
  * HUGEINT (int128) arithmetic mod 2^64 reproduces u64 semantics
  * exactly (validated against Spark ground-truth vectors for every
  * path: long, int, empty/1/4/8/10/36-byte strings — the 36-byte case
  * exercises the 32-byte stripe loop).
  *
  * Conventions:
  *  - "u64 domain" = a HUGEINT expression with value in [0, 2^64);
  *    [[u64]]/[[toSigned]] convert to/from Spark's signed longs.
  *  - Generated SQL uses `list_transform([e], x -> body)[1]` as a
  *    let-binding (SQL lambdas have no `let`; DuckDB forbids
  *    subqueries inside lambdas, so bindings nest instead).
  *  - String paths assume ASCII input (`ord(substr(...))` reads
  *    codepoints, which equal bytes only for ASCII) — every call site
  *    hashes synthetic-corpus tokens that are ASCII by construction,
  *    and the generated SQL GUARDS the assumption: non-ASCII input
  *    (detected as `length(s) <> strlen(s)`, chars vs UTF-8 bytes)
  *    yields NULL, which fails the oracle compare LOUDLY instead of
  *    silently hashing codepoints as if they were bytes.
  *  - [[xxhash64String]] additionally assumes length < 32 (no stripe
  *    loop generated); out-of-contract lengths NULL out the same way.
  *  - DuckHashContractSpec pins both guards with generated vectors
  *    (in-contract values must equal Spark's own hash; out-of-contract
  *    values must be NULL, never a silently wrong hash).
  */
object DuckHash {

  private val M = "18446744073709551616::HUGEINT" // 2^64
  private val MASK = "18446744073709551615::HUGEINT" // 2^64 - 1
  private val MASK32 = "4294967295::HUGEINT" // 2^32 - 1
  private val HALF = "9223372036854775808::HUGEINT" // 2^63
  // XXH64 primes (unsigned decimal)
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private val ctr = new java.util.concurrent.atomic.AtomicInteger(0)
  private def let(expr: String)(body: String => String): String = {
    val v = s"xh${ctr.incrementAndGet()}"
    s"list_transform([$expr], $v -> ${body(v)})[1]"
  }

  /** Public let-binding for callers composing these expressions (bind
    * a generated hash once instead of duplicating it per reference). */
  def letSql(expr: String)(body: String => String): String = let(expr)(body)

  /** Signed BIGINT expr → u64 domain. All u64 arithmetic here uses
    * HUGEINT bitwise masks/shifts, never `%`/`//` — int128 division is
    * a software path in DuckDB (~25× slower per stage, measured). */
  def u64(signedExpr: String): String =
    s"((($signedExpr)::HUGEINT + $M) & $MASK)"

  /** u64 domain → signed BIGINT (two's complement reinterpretation). */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN $u >= $HALF THEN $u - $M ELSE $u END AS BIGINT)"

  /** (a * b) mod 2^64 without overflowing int128: split a at 2^32.
    * Public for callers spelling other u64 kernels (e.g. the LSH
    * splitmix64 plane signs in Knn.lshTopKSql). */
  def mul64(a: String, b: String): String =
    s"(((($a & $MASK32) * $b) + (((($a >> 32) * $b) & $MASK32) << 32)) & $MASK)"

  private def rotl(x: String, r: Int): String =
    s"((($x << $r) | ($x >> ${64 - r})) & $MASK)"

  private def fmix(h: String): String =
    let(s"xor($h, $h >> 33)") { f1 =>
      let(mul64(f1, P2)) { f2 =>
        let(s"xor($f2, $f2 >> 29)") { f3 =>
          let(mul64(f3, P3)) { f4 =>
            s"xor($f4, $f4 >> 32)" } } } }

  /** One 8-byte word round: h = rotl(h ^ rotl(k1*P2,31)*P1, 27)*P1+P4.
    * `acc`/`k1` must be simple vars (lambda params or let bindings). */
  private def wordRound(acc: String, k1: String): String =
    let(mul64(k1, P2)) { a =>
      let(rotl(a, 31)) { b =>
        let(mul64(b, P1)) { c =>
          let(s"xor($acc, $c)") { h1 =>
            let(rotl(h1, 27)) { h1r =>
              s"((${mul64(h1r, P1)} + $P4) & $MASK)" } } } } }

  /** Spark `xxhash64` of one LONG field. `input`/`seed` in u64 domain. */
  def xxhash64Long(input: String, seed: String): String =
    let(input) { i =>
      let(s"(($seed + $P5 + 8) & $MASK)") { h0 =>
        let(wordRound(h0, i)) { h2 => fmix(h2) } } }

  /** Spark `xxhash64` of one INT field (4-byte path). `input` a plain
    * (possibly negative) integer expr; `seed` in u64 domain. */
  def xxhash64Int(input: String, seed: String): String = {
    val u32 = s"((($input)::HUGEINT + 4294967296::HUGEINT) & $MASK32)"
    let(u32) { i =>
      let(s"(($seed + $P5 + 4) & $MASK)") { h0 =>
        let(s"xor($h0, ${mul64(i, P1)})") { h1 =>
          let(rotl(h1, 23)) { h1r =>
            let(s"((${mul64(h1r, P2)} + $P3) & $MASK)") { h2 =>
              fmix(h2) } } } } }
  }

  /** Little-endian word of `nbytes` chars of `s` at 0-based offset
    * expr `base0` (ASCII: byte == codepoint). */
  private def leWord(s: String, base0: String, nbytes: Int): String =
    (1 to nbytes).map { j =>
      s"(ord(substr($s, ($base0) + $j, 1))::HUGEINT << ${8 * (j - 1)})"
    }.mkString("(", " + ", ")")

  /** Spark `xxhash64` of one STRING field — ASCII, length < 32 (the
    * no-stripe path). Out-of-contract input (≥32 chars, or non-ASCII
    * where codepoints ≠ bytes) returns NULL via the guard — a loud
    * oracle failure, never a silently wrong hash. `s` must be a
    * simple column/var reference; `seed` in u64 domain. */
  def xxhash64String(s: String, seed: String): String = {
    val words =
      s"list_transform(range(1, length($s)//8 + 1), w -> ${leWord(s, "(w-1)*8", 8)})"
    val init = s"((($seed + $P5 + length($s)::HUGEINT) & $MASK))"
    val afterWords =
      s"list_reduce(list_prepend($init, $words), (acc, k1) -> ${wordRound("acc", "k1")})"
    val off4 = s"(length($s)//8)*8"
    def step4(h: String): String =
      let(leWord(s, off4, 4)) { w32 =>
        let(s"xor($h, ${mul64(w32, P1)})") { h1 =>
          let(rotl(h1, 23)) { h1r =>
            s"((${mul64(h1r, P2)} + $P3) & $MASK)" } } }
    val after4 = let(afterWords) { h =>
      s"CASE WHEN length($s)%8 >= 4 THEN ${step4(h)} ELSE $h END" }
    val tStart =
      s"((length($s)//8)*8 + CASE WHEN length($s)%8 >= 4 THEN 4 ELSE 0 END)"
    val tail =
      s"list_transform(range($tStart + 1, length($s) + 1), p -> ord(substr($s, p, 1))::HUGEINT)"
    def byteStep(acc: String, b: String): String =
      let(s"xor($acc, ${mul64(b, P5)})") { h1 => mul64(rotl(h1, 11), P1) }
    val afterTail =
      s"list_reduce(list_prepend($after4, $tail), (acc, b) -> ${byteStep("acc", "b")})"
    s"CASE WHEN length($s) < 32 AND length($s) = strlen($s) " +
      s"THEN ${let(afterTail)(h => fmix(h))} END"
  }

  /** Staged (vectorized) forms: instead of one nested-lambda scalar,
    * the hash is a PIPELINE of simple expressions each consuming and
    * re-emitting a u64 column `h` — the caller wraps them in chained
    * CTEs. On row counts in the tens of millions this is ~50× faster
    * than the lambda form (no per-row list allocations; every stage is
    * one vectorized int128 pass). */

  /** Stages mapping h := fmix(h). */
  private def fmixStages: Seq[String] = Seq(
    "xor(h, h >> 33)", mul64("h", P2),
    "xor(h, h >> 29)", mul64("h", P3), "xor(h, h >> 32)")

  /** Stages mapping h := xxhash64Long(h, seedU64) — h starts as the
    * u64 of the long input; `seedU64` is a constant-foldable expr. */
  def xxhash64LongStages(seedU64: String): Seq[String] = Seq(
    mul64("h", P2), rotl("h", 31), mul64("h", P1),
    s"xor((($seedU64 + $P5 + 8) & $MASK), h)",
    rotl("h", 27), s"((${mul64("h", P1)} + $P4) & $MASK)") ++ fmixStages

  /** Stages mapping h := xxhash64Int(intCol, h) — h starts as the
    * SEED (e.g. the previous field's hash); `intCol` a column ref. */
  def xxhash64IntStages(intCol: String): Seq[String] = {
    val u32 = s"((($intCol)::HUGEINT + 4294967296::HUGEINT) & $MASK32)"
    Seq(s"((h + $P5 + 4) & $MASK)",
      s"xor(h, ${mul64(u32, P1)})",
      rotl("h", 23), s"((${mul64("h", P2)} + $P3) & $MASK)") ++ fmixStages
  }

  /** Assemble staged expressions into chained CTEs: each stage becomes
    * `name_i AS (SELECT <carry>, <stage> AS h FROM <prev>)`, starting
    * from `src` which must already expose column `h` (plus the carried
    * columns). Returns (cteText, lastName) for splicing after a WITH
    * entry — cteText starts with a comma. */
  def stagedCtes(src: String, carry: Seq[String], stages: Seq[String],
      prefix: String): (String, String) = {
    val carryCols = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) src else s"$prefix${i - 1}"
      s"$prefix$i AS (SELECT $carryCols$st AS h FROM $from)"
    }
    (ctes.mkString(",\n", ",\n", ""), s"$prefix${stages.size - 1}")
  }

  /** fnv1a64 of an ASCII string (any length): h = (h ^ byte) * prime,
    * folded left over the bytes from offset basis 0xcbf29ce484222325.
    * Non-ASCII input (codepoints ≠ bytes) returns NULL via the guard —
    * a loud oracle failure, never a silently wrong hash. */
  def fnv1a64String(s: String): String = {
    val basis = "14695981039346656037::HUGEINT"
    val prime = "1099511628211::HUGEINT"
    val bytes =
      s"list_transform(range(1, length($s) + 1), p -> ord(substr($s, p, 1))::HUGEINT)"
    s"CASE WHEN length($s) = strlen($s) THEN " +
      s"list_reduce(list_prepend($basis, $bytes), (acc, b) -> ${mul64(s"xor(acc, b)", prime)}) END"
  }

  /** Fixed-point log2 CTE pipeline (r12, the unigram-LM twin kernel):
    * computes the EXACT integer `graft.text.UnigramLm.log2fp(c, tot)`
    * — ≈ log2(c/tot)·2^fbits for 1 ≤ c ≤ tot — as chained one-liner
    * CTEs, every step a u64/HUGEINT shift/compare/multiply plus ONE
    * int128 division (tiny row counts only; the 25×-slower software
    * path is irrelevant at vocab scale). Algorithm (validated 0/834
    * prototype mismatches vs the Scala spelling): greedy binary
    * normalization of c into [tot, 2·tot) counting doublings e, one
    * 31-bit fixed-point mantissa division, then `fbits` squaring
    * steps each emitting one result bit; every truncation is a
    * deterministic integer shift, so both engines land the same
    * integer — no float enters on either side.
    *
    * `src` must expose `$keyCol` and `$valCol`; `totCte` a 1-row CTE
    * with column `tot`. Returns (cteText starting with a comma,
    * lastCteName) whose final shape is ($keyCol, ql BIGINT). */
  def log2fpCtes(src: String, keyCol: String, valCol: String,
      totCte: String, prefix: String, fbits: Int = 20): (String, String) =
    log2fpRowCtes(
      s"(SELECT $keyCol, ($valCol) AS __val, " +
        s"(SELECT tot FROM $totCte) AS __tot FROM $src)",
      Seq(keyCol), "__val", "__tot", prefix, fbits)

  /** The per-ROW-denominator generalization of [[log2fpCtes]] (r13,
    * the BLEU quantized-score kernel): `src` exposes `$keyCols`, a
    * value `$valCol` and its OWN total `$totCol` per row — each row
    * gets its log2(val/tot)·2^fbits independently (the scalar-tot
    * form above delegates here). Same stage pipeline; the executed
    * contract is Log2fpContractSpec — the generated CTEs run in a
    * real DuckDB against [[graft.util.FixedLog.log2fp]] on a
    * per-row (val, tot) sweep. */
  def log2fpRowCtes(src: String, keyCols: Seq[String], valCol: String,
      totCol: String, prefix: String, fbits: Int = 20): (String, String) = {
    val keys = keyCols.mkString(", ")
    val shiftStages = Seq(32, 16, 8, 4, 2, 1).map { k =>
      s"SELECT $keys, tot, " +
        s"CASE WHEN (num << $k) < tot THEN num << $k ELSE num END AS num, " +
        s"CASE WHEN (num << $k) < tot THEN e + $k ELSE e END AS e FROM __P__"
    } :+ (s"SELECT $keys, tot, " +
      "CASE WHEN num < tot THEN num << 1 ELSE num END AS num, " +
      "CASE WHEN num < tot THEN e + 1 ELSE e END AS e FROM __P__")
    val mInit =
      s"SELECT $keys, e, (num << 31) // tot AS m, 0::HUGEINT AS res FROM __P__"
    val sq = "((m*m) >> 31)"
    val sqStages = (1 to fbits).map { _ =>
      s"SELECT $keys, e, " +
        s"CASE WHEN $sq >= 4294967296::HUGEINT THEN $sq >> 1 ELSE $sq END AS m, " +
        s"res*2 + CASE WHEN $sq >= 4294967296::HUGEINT THEN 1 ELSE 0 END AS res FROM __P__"
    }
    val fin =
      s"SELECT $keys, CAST(res - (e << $fbits) AS BIGINT) AS ql FROM __P__"
    val s0 = s"SELECT $keys, ($valCol)::HUGEINT AS num, 0::HUGEINT AS e, " +
      s"($totCol)::HUGEINT AS tot FROM $src"
    val all = Seq(s0) ++ shiftStages ++ Seq(mInit) ++ sqStages ++ Seq(fin)
    val ctes = all.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) st else st.replace("__P__", s"$prefix${i - 1}")
      s"$prefix$i AS ($from)"
    }
    (ctes.mkString(",\n", ",\n", ""), s"$prefix${all.size - 1}")
  }

  /** Rabin–Karp base-257 hash of the k-char gram of `s` at 1-based
    * position expr `pos1` — Σ char(pos1+j)·257^(k-1-j) mod 2^64, the
    * winnowing production gram hash. Contract (executable, not just
    * documented — Rk257ContractSpec): the production side reads UTF-16
    * code units, this side reads codepoints, equal for every BMP
    * character (winnowing's ASCII corpus is comfortably inside);
    * astral input shifts lengths/positions, so a violation diverges
    * STRUCTURALLY at the fingerprint compare, never silently. */
  def rk257Gram(s: String, pos1: String, k: Int): String = {
    val terms = (0 until k).map { j =>
      val pow = java.math.BigInteger.valueOf(257)
        .pow(k - 1 - j).mod(java.math.BigInteger.TWO.pow(64))
      mul64(s"ord(substr($s, ($pos1) + $j, 1))::HUGEINT", s"$pow::HUGEINT")
    }
    s"((${terms.mkString(" + ")}) & $MASK)"
  }
}
