package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.{DuckHash, FixedLog}

/** Graft-KERNEL HyperLogLog — the from-first-principles twin of
  * [[SketchRollup]]'s DataSketches library path, built so that the
  * ENTIRE sketch (register math AND estimator) replays hash-exactly
  * in the DuckDB oracle: the "register u64 masks + leading-zero
  * counts in SQL" last word.
  *
  * Construction (Flajolet et al., and the classic low-range fix from
  * Whang's linear counting):
  *  - key hash = the engine's own `xxhash64` (seed 42), the exact
  *    u64 already spelled in DuckDB by [[graft.util.DuckHash]];
  *  - register index = low `P` hash bits; rank = leading-zero count
  *    of the remaining 64−P bits + 1 (computed EXACTLY via the
  *    bit-length of the unsigned-shifted value — `length(bin(v))`
  *    in both engines — never a float log);
  *  - raw estimator αm²/Σ2^(−r) in integer e6 units: Σ 2^(C−r) over
  *    all m registers (zero registers contribute 2^C, C = 64−P+1)
  *    accumulated in decimal(38,0)/HUGEINT, one integral division;
  *  - small-range regime (raw ≤ 2.5m, zero registers V ≥ 1):
  *    linear counting m·ln(m/V) through the fixed-point log2 kernel
  *    ([[FixedLog.log2fp]] / [[DuckHash.log2fpCtes]]) and an integer
  *    ln2 constant — every step integer, both engines identical.
  *
  * Scale shape: one scan; two-level aggregation (grp,idx)→(grp) with
  * map-side partial combine; registers are per-item MAXIMA so shard
  * merge is register-max and BIT-identical to a single-pass rebuild
  * (HllKernelSpec pins this — the library union gadget re-estimates
  * and is only statistically equivalent). The per-group finishing
  * step runs on the dimension-sized aggregate (≤ one row per group).
  *
  * The exact distinct count rides along for free and exactly:
  * Σ_idx countDistinct(key | grp, idx) = countDistinct(key | grp)
  * because a key hashes to exactly one register.
  */
object HllKernel {

  val P = 10
  val M: Int = 1 << P // 1024 registers → RSE 1.04/√m ≈ 3.25%
  val MaxRank: Int = 64 - P + 1 // 55
  val Fbits = 20
  /** floor(ln2 · 1e6) — the one transcendental, pinned as an integer
    * constant shared verbatim by both engines. */
  val Ln2E6 = 693147L
  /** floor(α_m · 1e6), α_m = 0.7213/(1 + 1.079/m) (m ≥ 128 form). */
  val AlphaE6: Long = math.floor(0.7213 / (1 + 1.079 / M) * 1e6).toLong
  /** Raw-estimator numerator α_m·m²·2^C in e6 units (exceeds a long;
    * lives in decimal(38,0)/HUGEINT on both sides). */
  val RawNumE6: BigInt = BigInt(AlphaE6) * BigInt(M) * BigInt(M) *
    (BigInt(1) << MaxRank)
  /** Linear-counting cutover: raw estimate ≤ 2.5·m, in e6 units. */
  val LcCutE6: Long = 2500000L * M

  /** Per-(group, register) state: max rank, plus (by default) the
    * exact distinct keys that hashed into the register — the witness
    * column. One shuffle, partial-agg friendly. With
    * `withExact = false` the aggregation carries ONLY the bounded
    * register maxima. (Catalyst's ColumnPruning does drop an unused
    * countDistinct — verified in the rollup plan — but the pure
    * sketch path should state its bounded-shuffle contract rather
    * than lean on an optimizer rule: the exact path shuffles the full
    * distinct key set, which a sketch-only caller must not pay.) */
  def registers(df: DataFrame, grpCol: String, keyCol: String,
      withExact: Boolean = true): DataFrame = {
    val ranked = df.filter(col(keyCol).isNotNull)
      .select(col(grpCol).as("grp"), col(keyCol).as("k"),
        xxhash64(col(keyCol)).as("h"))
      .select(col("grp"), col("k"),
        expr(s"h & ${M - 1}").as("idx"),
        expr(s"shiftrightunsigned(h, $P)").as("v"))
      .withColumn("rank",
        when(col("v") === 0L, lit(MaxRank))
          .otherwise(lit(MaxRank) - length(bin(col("v")))))
      .groupBy(col("grp"), col("idx"))
    if (withExact)
      ranked.agg(max(col("rank")).as("reg"), countDistinct(col("k")).as("nd"))
    else ranked.agg(max(col("rank")).as("reg"))
  }

  /** Per-group estimate in e6 units + the raw (uncorrected) estimate,
    * zero-register count, and the exact distinct count for reference.
    * `grpCol` may be any type — it is cast to string up front (the
    * [[estimateSketchOnly]] convention; the typed finishing map reads
    * a string group, and pre-r13 a long group column hit that encoder
    * with an AnalysisException — r12 ADVICE).
    * Contract: est_raw_e6 < 2^63 requires at least one register below
    * rank 9 — true for any non-adversarial key set. */
  def estimate(df: DataFrame, grpCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(col(grpCol).cast("string").as("g"), col(keyCol))
    val perGroup = registers(src, "g", keyCol)
      .groupBy(col("grp"))
      .agg(
        sum(expr(s"CAST(shiftleft(1L, $MaxRank - reg) AS DECIMAL(38,0))"))
          .as("s_present"),
        count(lit(1)).as("n_present"),
        sum(col("nd")).as("n_exact"))
      .withColumn("s_all",
        col("s_present") + (lit(M.toLong) - col("n_present"))
          .cast("decimal(38,0)") * lit(1L << MaxRank).cast("decimal(38,0)"))
      .withColumn("est_raw_e6", expr(s"CAST('$RawNumE6' AS DECIMAL(38,0)) div s_all"))
      .select(col("grp"), (lit(M.toLong) - col("n_present")).as("zero_regs"),
        col("est_raw_e6"), col("n_exact"))
    // regime selection + linear counting: a typed map over the
    // dimension-sized per-group frame (≤ one row per group) reusing
    // the audited integer log2 kernel verbatim — its Catalyst spelling
    // would be the same 27-stage pipeline the oracle replays in SQL.
    perGroup.as[(String, Long, Long, Long)]
      .map { case (grp, zeroRegs, estRawE6, nExact) =>
        (grp, zeroRegs, estRawE6, estE6(zeroRegs, estRawE6), nExact)
      }
      .toDF("grp", "zero_regs", "est_raw_e6", "est_e6", "n_exact")
  }

  /** Raw per-group estimates off a registers frame (grp of ANY type):
    * (grp, zero_regs, est_raw_e6) — one column spelling of the
    * estimator shared by every finishing face. */
  private def rawEstimates(regs: DataFrame): DataFrame =
    regs.groupBy(col("grp"))
      .agg(
        sum(expr(s"CAST(shiftleft(1L, $MaxRank - reg) AS DECIMAL(38,0))"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .withColumn("s_all",
        col("s_present") + (lit(M.toLong) - col("n_present"))
          .cast("decimal(38,0)") * lit(1L << MaxRank).cast("decimal(38,0)"))
      .withColumn("est_raw_e6",
        expr(s"CAST('$RawNumE6' AS DECIMAL(38,0)) div s_all"))
      .select(col("grp"), (lit(M.toLong) - col("n_present")).as("zero_regs"),
        col("est_raw_e6"))

  /** Sketch-only estimate — NO exact witness, so the whole job keeps
    * the bounded-shuffle contract (registers carry only maxima).
    * Output (grp: string, zero_regs, est_e6) — the streaming batch
    * twin ([[graft.streaming.StreamHll.distinctEstimatesBatch]]). */
  def estimateSketchOnly(df: DataFrame, grpCol: String,
      keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(col(grpCol).cast("string").as("g"), col(keyCol))
    rawEstimates(registers(src, "g", keyCol, withExact = false))
      .as[(String, Long, Long)]
      .map { case (grp, zeroRegs, estRawE6) =>
        (grp, zeroRegs, estE6(zeroRegs, estRawE6))
      }
      .toDF("grp", "zero_regs", "est_e6")
  }

  /** Estimator over a raw m-byte register array — the streaming-state
    * face ([[graft.streaming.StreamHll]]): the SAME integer
    * arithmetic as the column path (BigInt `/` ≡ decimal `div` for
    * positive operands), so a converged stream's estimates are
    * BIT-equal to the batch gate's. Returns (zero_regs, est_e6). */
  def estimateFromRegisterArray(regs: Array[Byte]): (Long, Long) = {
    require(regs.length == M)
    var s = BigInt(0); var zero = 0L
    var i = 0
    while (i < M) {
      val r = regs(i).toInt
      if (r == 0) zero += 1
      s += BigInt(1) << (MaxRank - r)
      i += 1
    }
    val raw = (RawNumE6 / s).toLong
    (zero, estE6(zero, raw))
  }

  /** The per-group scalar finisher: linear counting below the
    * cutover (zero registers permitting), raw estimate above. */
  def estE6(zeroRegs: Long, estRawE6: Long): Long =
    if (zeroRegs > 0 && estRawE6 <= LcCutE6)
      M.toLong * Ln2E6 *
        (-FixedLog.log2fp(zeroRegs, M.toLong, Fbits)) / (1L << Fbits)
    else estRawE6

  /** The INCREMENTAL face — the architecture a_hll_partial shows with
    * the DataSketches library, here with the kernel and hash-exact:
    * registers built at a FINE grain (per hour — the rows a pipeline
    * PERSISTS per ingest batch), max-merged to the coarse day grain,
    * estimated off the merged registers only. Because merge is
    * register-max, the rollup is BIT-identical to a single daily
    * pass (HllKernelSpec) — so the oracle replay of this very
    * hour→day path proves the incremental architecture itself.
    * `hourCol` must be a long fine-grain bucket id; day = hour/24. */
  def rollupEstimate(df: DataFrame, hourCol: String,
      keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dayRegs = registers(df, hourCol, keyCol, withExact = false)
      .groupBy(expr("grp div 24").as("grp"), col("idx"))
      .agg(max(col("reg")).as("reg"))
    rawEstimates(dayRegs).as[(Long, Long, Long)]
      .map { case (day, zeroRegs, estRawE6) =>
        (day, zeroRegs, estRawE6, estE6(zeroRegs, estRawE6))
      }
      .toDF("day_id", "zero_regs", "est_raw_e6", "est_e6")
  }

  /** DuckDB mirror of [[estimate]]: staged xxhash64 CTEs (vectorized
    * u64 pipeline), register ranks via `length(bin(...))`, the raw
    * estimator in HUGEINT, and linear counting through
    * [[DuckHash.log2fpCtes]] — the same 2^-20 fixed-point log2 the
    * engine computes. */
  def estimateSql(from: String = "events", grpExpr: String = "event_type",
      keyExpr: String = "user_id"): String = {
    import DuckHash._
    val (hashCtes, lastHash) =
      stagedCtes("hllsrc", Seq("grp", "k"), xxhash64LongStages("42::HUGEINT"), "hllh")
    val (lcCtes, lcLast) =
      log2fpCtes("hlllcsrc", "grp", "zero_regs", "hllmtot", "hlllg", Fbits)
    s"""WITH hllsrc AS (
       |  SELECT $grpExpr AS grp, $keyExpr AS k, ${u64(keyExpr)} AS h
       |  FROM $from WHERE $keyExpr IS NOT NULL)$hashCtes,
       |hllrnk AS (SELECT grp, k,
       |  CAST(h & ${M - 1}::HUGEINT AS BIGINT) AS idx,
       |  CASE WHEN (h >> $P) = 0::HUGEINT THEN $MaxRank
       |       ELSE $MaxRank - length(bin(CAST(h >> $P AS BIGINT))) END AS rank
       |  FROM $lastHash),
       |hllreg AS (SELECT grp, idx, MAX(rank) AS reg, COUNT(DISTINCT k) AS nd
       |  FROM hllrnk GROUP BY 1, 2),
       |hllagg AS (SELECT grp,
       |  SUM(1::HUGEINT << ($MaxRank - reg)) AS s_present,
       |  COUNT(*) AS n_present,
       |  CAST(SUM(nd) AS BIGINT) AS n_exact
       |  FROM hllreg GROUP BY 1),
       |hllraw AS (SELECT grp,
       |  CAST($M - n_present AS BIGINT) AS zero_regs,
       |  CAST(CAST('$RawNumE6' AS HUGEINT) //
       |    (s_present + ($M - n_present)::HUGEINT * (1::HUGEINT << $MaxRank))
       |    AS BIGINT) AS est_raw_e6,
       |  n_exact FROM hllagg),
       |hlllcsrc AS (SELECT grp, zero_regs FROM hllraw WHERE zero_regs >= 1),
       |hllmtot AS (SELECT $M AS tot)$lcCtes
       |SELECT r.grp, r.zero_regs, r.est_raw_e6,
       |  CASE WHEN r.zero_regs > 0 AND r.est_raw_e6 <= $LcCutE6
       |       THEN CAST((${M}::BIGINT * $Ln2E6 * -(l.ql)) // ${1L << Fbits}
       |                 AS BIGINT)
       |       ELSE r.est_raw_e6 END AS est_e6,
       |  r.n_exact
       |FROM hllraw r LEFT JOIN $lcLast l ON l.grp = r.grp""".stripMargin
  }

  /** DuckDB mirror of [[rollupEstimate]] over the events table (plus
    * the exact daily distinct witness the gate joins in): the SAME
    * hour→day register path — hourly GROUP BY, max-merge, estimator
    * over merged registers — not a direct daily shortcut, so the
    * oracle proves the incremental architecture. */
  def rollupEstimateSql(from: String = "events", hourSql: String,
      keyExpr: String = "user_id"): String = {
    import DuckHash._
    val (hashCtes, lastHash) =
      stagedCtes("hrsrc", Seq("grp"), xxhash64LongStages("42::HUGEINT"), "hrh")
    val (lcCtes, lcLast) =
      log2fpCtes("hrlcsrc", "day_id", "zero_regs", "hrmtot", "hrlg", Fbits)
    s"""WITH hrsrc AS (
       |  SELECT $hourSql AS grp, ${u64(keyExpr)} AS h
       |  FROM $from WHERE $keyExpr IS NOT NULL)$hashCtes,
       |hrrnk AS (SELECT grp,
       |  CAST(h & ${M - 1}::HUGEINT AS BIGINT) AS idx,
       |  CASE WHEN (h >> $P) = 0::HUGEINT THEN $MaxRank
       |       ELSE $MaxRank - length(bin(CAST(h >> $P AS BIGINT))) END AS rank
       |  FROM $lastHash),
       |hrreg AS (SELECT grp, idx, MAX(rank) AS reg
       |  FROM hrrnk GROUP BY 1, 2),
       |hrday AS (SELECT grp // 24 AS day_id, idx, MAX(reg) AS reg
       |  FROM hrreg GROUP BY 1, 2),
       |hragg AS (SELECT day_id,
       |  SUM(1::HUGEINT << ($MaxRank - reg)) AS s_present,
       |  COUNT(*) AS n_present
       |  FROM hrday GROUP BY 1),
       |hrraw AS (SELECT day_id,
       |  CAST($M - n_present AS BIGINT) AS zero_regs,
       |  CAST(CAST('$RawNumE6' AS HUGEINT) //
       |    (s_present + ($M - n_present)::HUGEINT * (1::HUGEINT << $MaxRank))
       |    AS BIGINT) AS est_raw_e6
       |  FROM hragg),
       |hrlcsrc AS (SELECT day_id, zero_regs FROM hrraw WHERE zero_regs >= 1),
       |hrmtot AS (SELECT $M AS tot)$lcCtes,
       |hrexact AS (SELECT ($hourSql) // 24 AS day_id,
       |  CAST(COUNT(DISTINCT $keyExpr) AS BIGINT) AS n_exact
       |  FROM $from WHERE $keyExpr IS NOT NULL GROUP BY 1)
       |SELECT r.day_id, r.zero_regs, r.est_raw_e6,
       |  CASE WHEN r.zero_regs > 0 AND r.est_raw_e6 <= $LcCutE6
       |       THEN CAST((${M}::BIGINT * $Ln2E6 * -(l.ql)) // ${1L << Fbits}
       |                 AS BIGINT)
       |       ELSE r.est_raw_e6 END AS est_e6,
       |  e.n_exact
       |FROM hrraw r LEFT JOIN $lcLast l ON l.day_id = r.day_id
       |JOIN hrexact e ON e.day_id = r.day_id""".stripMargin
  }
}
