package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.{DuckHash, FixedLog}

/** N-gram-overlap generation eval — BLEU/ROUGE-n style CLIPPED-count
  * precision/recall over (candidate, reference) text pairs (Papineni
  * et al. BLEU modified precision; Lin ROUGE-n recall). The eval-side
  * twin of [[CorpusPipeline.contamination]] (r12 verdict item 8): the
  * same word-n-gram substrate, but counted WITH multiplicity and
  * clipped per gram — the metric a training-data team runs over model
  * generations vs references.
  *
  * Per pair, with c(g)/r(g) the gram multiplicities on each side:
  *   clipped   = Σ_g min(c(g), r(g))      (pure integer min/sum algebra)
  *   precision = clipped / Σ_g c(g)        (BLEU-n, no brevity penalty)
  *   recall    = clipped / Σ_g r(g)        (ROUGE-n)
  *
  * Scale shape: ONE text scan and TWO key shuffles, zero joins — the
  * pair id and side are pure arithmetic on doc_id, so both sides of a
  * pair meet in one (pair, gram) aggregation with conditional sums
  * (min(c, r) is 0 for any gram on one side only, so the clipped sum
  * needs no outer join), then one pair-level rollup. The gram text
  * never leaves the scan — and since r14 is never even MATERIALIZED:
  * the [[graft.functions.GramHash]] rolling kernel emits every order's
  * window hashes in O(1) per (position, order) with zero per-gram
  * allocation, and the packed 60-bit hash is the shuffle currency (the
  * oracle groups by md5 of the gram text — only collision behavior
  * must agree, both ~0, the contamination convention). At 100 TB this
  * is two hash aggregations with map-side partial combine, nothing
  * else.
  *
  * Pairing contract: candidate = even doc_id, reference = doc_id + 1
  * (Euclidean parity on both engines — the SQL spells pmod, so a
  * negative doc_id pairs identically); pairs missing either side (or
  * whose side has < n words) are dropped. The per-row double
  * divisions are exact-integer inputs through one IEEE divide —
  * bit-identical cross-engine.
  */
object NgramEval {

  def clippedOverlap(docs: DataFrame, n: Int = 2): DataFrame =
    pairKernelCounts(PairedText.paired(docs), Seq("pair_id"),
      PairGramKernel.wordGrams(_, n, n, 0))
      .groupBy(col("pair_id"))
      .agg(
        sum(col("clipped")).as("clipped"),
        sum(col("c_total")).as("c_total"),
        sum(col("r_total")).as("r_total"))
      .filter(col("c_total") > 0 && col("r_total") > 0)
      .select(col("pair_id"), col("clipped"), col("c_total"), col("r_total"),
        (col("clipped").cast("double") / col("c_total")).as("precision_n"),
        (col("clipped").cast("double") / col("r_total")).as("recall_n"))

  /** The ONE pinned integer ln2 — [[graft.ops.HllKernel.Ln2E6]]; a
    * retune there must move the BLEU brevity penalty with it. */
  private def Ln2E6: Long = graft.ops.HllKernel.Ln2E6

  /** The shared kernel-counts builder (r15 optimization): from a
    * pivoted pair frame (`keyCols`..., c_text, r_text — one row per
    * key, NULL = absent side) to the (keyCols..., n, clipped, c_total,
    * r_total) frame every gram metric consumes, via the local
    * [[PairGramKernel]] count map instead of the exploded
    * (key, n, gram) hash aggregation. `gramsOf` produces the SAME
    * packed [[graft.functions.GramHash]] currency the exploded
    * spelling shuffled (empty array = absent side), so every count —
    * collision behavior included — is identical by construction; what
    * changes is the bytes moved: one text-sized key shuffle instead of
    * 6-9 hash rows per symbol (guide §2.3 "shuffle keys and metadata
    * instead of payloads", §8's decide-small/move-once rule). */
  private[text] def pairKernelCounts(paired: DataFrame, keyCols: Seq[String],
      gramsOf: String => Array[Long]): DataFrame = {
    val spark = paired.sparkSession
    import spark.implicits._
    val k2 = if (keyCols.size >= 2) col(keyCols(1)) else lit(0L)
    val rows = paired
      .select(col(keyCols.head).cast("long"), k2.cast("long"),
        col("c_text"), col("r_text"))
      .as[(Long, Long, String, String)]
      .mapPartitions { it =>
        val m = new GramCountMap
        it.flatMap { case (key1, key2, c, r) =>
          PairGramKernel.pairCounts(m, gramsOf(c), gramsOf(r))
            .map { case (n, cl, ct, rt) => (key1, key2, n, cl, ct, rt) }
        }
      }
      .toDF("_k1", "_k2", "n", "clipped", "c_total", "r_total")
    if (keyCols.size >= 2)
      rows.select(col("_k1").as(keyCols.head), col("_k2").as(keyCols(1)),
        col("n"), col("clipped"), col("c_total"), col("r_total"))
    else
      rows.select(col("_k1").as(keyCols.head),
        col("n"), col("clipped"), col("c_total"), col("r_total"))
  }

  /** Quad sibling of [[pairKernelCounts]] for the paired-bootstrap
    * gates: (quad_id, a_text, r_text, b_text) → (quad_id, n,
    * clipped_a, clipped_b, a_total, b_total, r_total), quads included
    * only when ALL THREE sides produce grams (exactly the
    * every-slot-unigram window rule of the exploded spelling — a
    * side's 1-gram count is ≥ 1 iff its gram array is non-empty). */
  private def quadKernelCounts(quads: DataFrame,
      gramsOf: String => Array[Long]): DataFrame = {
    val spark = quads.sparkSession
    import spark.implicits._
    quads
      .select(col("quad_id").cast("long"),
        col("a_text"), col("r_text"), col("b_text"))
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        val m = new GramCountMap
        it.flatMap { case (q, a, r, bTxt) =>
          val ag = gramsOf(a); val rg = gramsOf(r); val bg = gramsOf(bTxt)
          if (ag.isEmpty || rg.isEmpty || bg.isEmpty) Nil
          else PairGramKernel.quadCounts(m, ag, bg, rg).map {
            case (n, clA, clB, aT, bT, rT) => (q, n, clA, clB, aT, bT, rT)
          }
        }
      }
      .toDF("quad_id", "n", "clipped_a", "clipped_b",
        "a_total", "b_total", "r_total")
  }

  /** Composite BLEU-4 over the same (even, odd) pairs — geometric
    * mean of the four clipped precisions plus the brevity penalty,
    * ENTIRELY in integers so the whole score replays hash-exactly in
    * the oracle: the third family reuse of the fixed-point log2
    * kernel ([[FixedLog.log2fp]] / [[DuckHash.log2fpRowCtes]], after
    * the unigram-LM EM twin and HLL linear counting).
    *
    * Score spelling (monotone in BLEU, per pair):
    *   bleu_log2fp_x4 = Σ_{n=1..4} log2fp(cs_n, ts_n) + 4·bp_log2fp
    * i.e. 4·log2(BLEU)·2^fbits, where (cs, ts) = (clipped, c_total)
    * for n = 1 and the add-one-smoothed (clipped+1, c_total+1) for
    * n ≥ 2 (Chen & Cherry smoothing 2 — zero higher-order overlap
    * must not collapse the score), and
    *   bp_log2fp = min(0, (c_len − r_len)/(c_len·ln2))·2^fbits
    * (the BLEU brevity penalty exp(1 − r/c) in log2, one integral
    * division through the pinned integer ln2 constant, floor on the
    * positive magnitude then negated so both engines truncate
    * identically). BLEU = 2^(bleu_log2fp_x4 / (4·2^fbits)).
    * NULL when the candidate shares no unigram with the reference
    * (log 0 — the true BLEU is 0); pairs whose candidate has fewer
    * than 4 words or whose reference is absent are dropped.
    *
    * Scale shape: the [[clippedOverlap]] plan with all four gram
    * orders emitted from the ONE text scan (flatten of four window
    * transforms), then three key-grouped shuffles — (pair, n, gram) →
    * (pair, n) → (pair), each with map-side partial combine; the
    * per-(pair, n) log runs as a typed map over the aggregate frame —
    * a narrow distributed op, no collect, O(fbits) integer steps per
    * row. */
  /** The ONE per-(pair, order) clipped-count frame shared by [[bleu4]]
    * and [[bleu4Corpus]] — (pair_id, n, clipped, c_total, r_total)
    * for word orders 1..4 off one scan and two combined shuffles.
    * ([[RougeL.rougeNPerKey]] is the keyed orders-1..2 sibling.) */
  private def perPairWordCounts(docs: DataFrame): DataFrame =
    pairKernelCounts(PairedText.paired(docs), Seq("pair_id"),
      PairGramKernel.wordGrams(_, 1, 4, 0))

  /** The ONE brevity-penalty column (expects c_len/r_len), shared by
    * all three BLEU faces — a truncation-rule change moves together. */
  private def bpLog2fpCol(fbits: Int) =
    when(col("c_len") >= col("r_len"), lit(0L))
      .otherwise(expr(
        s"-CAST(CAST(r_len - c_len AS DECIMAL(38,0)) * ${1L << fbits} " +
          s"* 1000000 div (CAST(c_len AS DECIMAL(38,0)) * $Ln2E6) " +
          "AS BIGINT)"))

  def bleu4(docs: DataFrame, fbits: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withQ = perPairWordCounts(docs)
      .select(col("pair_id"), col("n").cast("int").as("n"),
        col("clipped"), col("c_total"), col("r_total"))
      .as[(Long, Int, Long, Long, Long)]
      .map { case (p, n, cl, ct, rt) =>
        val (cs, ts) = if (n == 1) (cl, ct) else (cl + 1L, ct + 1L)
        val q: Option[Long] =
          if (ct >= 1 && cs >= 1) Some(FixedLog.log2fp(cs, ts, fbits))
          else None
        (p, n, cl, ct, rt, q)
      }
      .toDF("pair_id", "n", "clipped", "c_total", "r_total", "qln")
    withQ.groupBy(col("pair_id"))
      .agg(
        sum(when(col("c_total") >= 1, 1).otherwise(0)).as("n_c_orders"),
        max(when(col("n") === 1, col("c_total"))).as("c_len"),
        max(when(col("n") === 1, col("r_total"))).as("r_len"),
        max(when(col("n") === 1, col("clipped"))).as("clipped_1"),
        max(when(col("n") === 2, col("clipped"))).as("clipped_2"),
        max(when(col("n") === 3, col("clipped"))).as("clipped_3"),
        max(when(col("n") === 4, col("clipped"))).as("clipped_4"),
        sum(col("qln")).as("sum_qln"),
        count(col("qln")).as("n_qln"))
      .filter(col("n_c_orders") === 4 && col("r_len") >= 1)
      .withColumn("bp_log2fp", bpLog2fpCol(fbits))
      .select(col("pair_id"), col("c_len"), col("r_len"),
        col("clipped_1"), col("clipped_2"), col("clipped_3"), col("clipped_4"),
        col("bp_log2fp"),
        when(col("clipped_1") >= 1 && col("n_qln") === 4,
          col("sum_qln") + lit(4L) * col("bp_log2fp")).as("bleu_log2fp_x4"))
  }

  /** Multi-reference BLEU-4 over an explicit pair-table face — the
    * shape real holdout evals take (a generations table against a
    * references table joined by key, with SEVERAL references per
    * candidate): `cands(cand_id, text)` × `refs(cand_id, ref_id,
    * text)`. Papineni's original multi-ref definition:
    *
    *  - per gram g, the clip is against the MAX count of g across the
    *    candidate's references: clipped_n = Σ_g min(c(g), max_r r(g));
    *  - the brevity-penalty reference length is the EFFECTIVE one —
    *    the ref length closest to c_len, ties to the SHORTER
    *    (sacreBLEU's convention), spelled engine-agnostically as
    *    argmin of the packed integer |r−c|·1e9 + r;
    *  - smoothing, fixed-point log2 composition, and the NULL regime
    *    (no unigram overlap anywhere) are exactly [[bleu4]]'s.
    *
    * Scale shape: the two tables meet in one UNION (side-tagged, the
    * trio's conditional-sum trick — max-over-refs needs one extra
    * (cand, n, gram, side, ref) pre-aggregation level), so gram
    * matching is still join-free; the only join is POST-aggregation —
    * effective-r_len onto the per-candidate frame, a few rows per
    * candidate on both sides, hash-partitioned by cand_id. Output
    * adds `n_refs` so a downstream aggregate can see the pairing
    * coverage it scored against. Single-ref inputs reproduce
    * [[bleu4]] scores exactly (NgramEvalSpec pins it). */
  def bleu4MultiRef(cands: DataFrame, refs: DataFrame,
      fbits: Int = 20): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    // r15 kernel spelling: ONE cand_id hash join + a per-candidate
    // collect of the (few) references replaces the exploded
    // (cand, n, gram, side, ref) aggregation chain AND the separate
    // ref-length scan + post-aggregation join — the Papineni
    // max-per-gram clip, the usable-ref count and the effective
    // (closest, ties-shorter) brevity length all run in the local
    // [[PairGramKernel]] over the SAME packed gram hashes, so every
    // count is identical by construction. collect_list skips
    // NULL-text refs, exactly the refLens filter of the exploded
    // spelling (r14 ADVICE item 2): n_refs counts only references
    // that can score.
    val perCand = cands
      .select(col("cand_id").cast("long").as("cand_id"),
        col("text").as("c_text"))
      .join(refs.select(col("cand_id").cast("long").as("cand_id"),
        col("text").as("r_text")), Seq("cand_id"))
      .groupBy(col("cand_id"))
      .agg(first(col("c_text")).as("c_text"),
        collect_list(col("r_text")).as("r_texts"))
      .as[(Long, String, Seq[String])]
      .mapPartitions { it =>
        val m = new GramCountMap
        val refM = new GramCountMap
        it.flatMap { case (cid, cTxt, rTxts) =>
          if (cTxt == null || rTxts.isEmpty) Nil
          else {
            val cWs = PairGramKernel.splitWs(cTxt)
            // the exploded spelling's n_c_orders === 4 drop: orders
            // 1..4 all candidate-populated ⟺ ≥ 4 words
            if (cWs.length < 4) Nil
            else {
              val cLen = cWs.length.toLong
              val counts = PairGramKernel.multiRefClippedCounts(m, refM,
                graft.functions.GramHash.wordGramArray(cWs, 1, 4, 0),
                rTxts.iterator.map(PairGramKernel.wordGrams(_, 1, 4, 0)))
              val cl = new Array[Long](5)
              counts.foreach { case (n, c, _) => cl(n) = c }
              var sumQ = 0L
              var nQ = 0L
              counts.foreach { case (n, c, t) =>
                val (cs, ts) = if (n == 1) (c, t) else (c + 1L, t + 1L)
                if (cs >= 1) { sumQ += FixedLog.log2fp(cs, ts, fbits); nQ += 1 }
              }
              var nRefs = 0L
              var rEnc = Long.MaxValue
              rTxts.foreach { r =>
                nRefs += 1
                val rl = PairGramKernel.splitWs(r).length.toLong
                val e = math.abs(rl - cLen) * 1000000000L + rl
                if (e < rEnc) rEnc = e
              }
              List((cid, nRefs, cLen, rEnc % 1000000000L,
                cl(1), cl(2), cl(3), cl(4),
                if (nQ >= 1) Some(sumQ) else None, nQ))
            }
          }
        }
      }
      .toDF("cand_id", "n_refs", "c_len", "r_len",
        "clipped_1", "clipped_2", "clipped_3", "clipped_4",
        "sum_qln", "n_qln")
    perCand
      .withColumn("bp_log2fp", bpLog2fpCol(fbits))
      .select(col("cand_id"), col("n_refs"), col("c_len"), col("r_len"),
        col("clipped_1"), col("clipped_2"), col("clipped_3"), col("clipped_4"),
        col("bp_log2fp"),
        when(col("clipped_1") >= 1 && col("n_qln") === 4,
          col("sum_qln") + lit(4L) * col("bp_log2fp")).as("bleu_log2fp_x4"))
  }

  /** CORPUS-level BLEU-4 over the (even, odd) pairs — the number
    * sacrebleu/WMT actually report: clipped and total gram counts SUM
    * across the corpus per order BEFORE the precision ratio (micro
    * average), and the brevity penalty runs on summed lengths; a
    * sentence-mean of [[bleu4]] scores is a different (and
    * non-standard) statistic. Same integer spelling:
    * bleu_log2fp_x4 = Σ_n log2fp(Σclipped_n, Σtotal_n) + 4·bp, with
    * RAW counts at every order (no smoothing — corpus sums hit zero
    * only when NO candidate 4-gram matches anywhere, and then the
    * score is NULL, the true log 0). Pairs missing a reference are
    * excluded; short candidates still contribute the orders they
    * have (their missing orders add 0 grams — the sacrebleu
    * convention). Output is ONE row. Scale shape: the [[bleu4]] gram
    * pipeline, then a 4-row corpus rollup — nothing new shuffles. */
  def bleu4Corpus(docs: DataFrame, fbits: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perPairN = perPairWordCounts(docs)
    // keep only pairs with BOTH sides present — a pair-partitioned
    // window over the ≤4-rows-per-pair frame, so the expensive gram
    // pipeline stays single-consumer (a self-join here would run the
    // whole gram aggregation twice)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("pair_id")
    val corpus = perPairN
      .withColumn("r_len_p",
        max(when(col("n") === 1, col("r_total"))).over(w))
      .withColumn("c_len_p",
        max(when(col("n") === 1, col("c_total"))).over(w))
      .filter(col("r_len_p") >= 1 && col("c_len_p") >= 1)
      .groupBy(col("n"))
      .agg(sum(col("clipped")).as("clipped"),
        sum(col("c_total")).as("c_total"),
        sum(col("r_total")).as("r_total"),
        count(lit(1)).as("n_pairs_n"))
      .select(col("n").cast("int").as("n"), col("clipped"), col("c_total"),
        col("r_total"), col("n_pairs_n"))
      .as[(Int, Long, Long, Long, Long)]
      .map { case (n, cl, ct, rt, np) =>
        val q: Option[Long] =
          if (ct >= 1 && cl >= 1) Some(FixedLog.log2fp(cl, ct, fbits))
          else None
        (n, cl, ct, rt, np, q)
      }
      .toDF("n", "clipped", "c_total", "r_total", "n_pairs_n", "qln")
    corpus.agg(
      max(when(col("n") === 1, col("n_pairs_n"))).as("n_pairs"),
      max(when(col("n") === 1, col("c_total"))).as("c_len"),
      max(when(col("n") === 1, col("r_total"))).as("r_len"),
      max(when(col("n") === 1, col("clipped"))).as("clipped_1"),
      max(when(col("n") === 2, col("clipped"))).as("clipped_2"),
      max(when(col("n") === 3, col("clipped"))).as("clipped_3"),
      max(when(col("n") === 4, col("clipped"))).as("clipped_4"),
      sum(col("qln")).as("sum_qln"),
      count(col("qln")).as("n_qln"))
      .withColumn("bp_log2fp", bpLog2fpCol(fbits))
      .select(col("n_pairs"), col("c_len"), col("r_len"),
        col("clipped_1"), col("clipped_2"), col("clipped_3"), col("clipped_4"),
        col("bp_log2fp"),
        when(col("n_qln") === 4,
          col("sum_qln") + lit(4L) * col("bp_log2fp")).as("bleu_log2fp_x4"))
  }

  /** DuckDB mirror of [[bleu4Corpus]]. */
  def bleu4CorpusSql(fbits: Int = 20, from: String = "documents"): String = {
    val (logCtes, logLast) = DuckHash.log2fpRowCtes(
      "bc_lsrc", Seq("n"), "clipped", "c_total", "bclg", fbits)
    val bp = s"CASE WHEN c_len >= r_len THEN 0 ELSE " +
      s"-CAST(((r_len - c_len)::HUGEINT * ${1L << fbits} * 1000000) // " +
      s"(c_len::HUGEINT * $Ln2E6) AS BIGINT) END"
    s"""WITH bc_ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $from),
       |bc_g AS (
       |  SELECT doc_id - (((doc_id % 2) + 2) % 2) AS pair_id,
       |         ((doc_id % 2) + 2) % 2 AS side, tn.n AS n,
       |         md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM bc_ws, unnest([1, 2, 3, 4]) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |bc_pg AS (SELECT pair_id, n, g,
       |  CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |  CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM bc_g GROUP BY 1, 2, 3),
       |bc_pn AS (SELECT pair_id, n,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS BIGINT) AS clipped,
       |  CAST(SUM(c_cnt) AS BIGINT) AS c_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total
       |  FROM bc_pg GROUP BY 1, 2),
       |bc_paired AS (SELECT pair_id FROM bc_pn GROUP BY 1
       |  HAVING MAX(CASE WHEN n = 1 THEN r_total END) >= 1
       |     AND MAX(CASE WHEN n = 1 THEN c_total END) >= 1),
       |bc_n AS (SELECT p.n,
       |  CAST(SUM(p.clipped) AS BIGINT) AS clipped,
       |  CAST(SUM(p.c_total) AS BIGINT) AS c_total,
       |  CAST(SUM(p.r_total) AS BIGINT) AS r_total,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs_n
       |  FROM bc_pn p JOIN bc_paired q ON q.pair_id = p.pair_id
       |  GROUP BY 1),
       |bc_lsrc AS (SELECT n, clipped, c_total FROM bc_n
       |  WHERE c_total >= 1 AND clipped >= 1)$logCtes,
       |bc_agg AS (SELECT
       |  MAX(CASE WHEN b.n = 1 THEN b.n_pairs_n END) AS n_pairs,
       |  MAX(CASE WHEN b.n = 1 THEN b.c_total END) AS c_len,
       |  MAX(CASE WHEN b.n = 1 THEN b.r_total END) AS r_len,
       |  MAX(CASE WHEN b.n = 1 THEN b.clipped END) AS clipped_1,
       |  MAX(CASE WHEN b.n = 2 THEN b.clipped END) AS clipped_2,
       |  MAX(CASE WHEN b.n = 3 THEN b.clipped END) AS clipped_3,
       |  MAX(CASE WHEN b.n = 4 THEN b.clipped END) AS clipped_4,
       |  CAST(SUM(l.ql) AS BIGINT) AS sum_qln,
       |  COUNT(l.ql) AS n_qln
       |  FROM bc_n b LEFT JOIN $logLast l ON l.n = b.n)
       |SELECT n_pairs, c_len, r_len,
       |  clipped_1, clipped_2, clipped_3, clipped_4,
       |  CAST($bp AS BIGINT) AS bp_log2fp,
       |  CASE WHEN n_qln = 4 THEN CAST(sum_qln + 4 * ($bp) AS BIGINT)
       |  END AS bleu_log2fp_x4
       |FROM bc_agg""".stripMargin
  }

  /** Paired-bootstrap significance for corpus BLEU-4 — sacrebleu's
    * `paired-bs` test: TWO systems' candidates scored against SHARED
    * references, Poisson-bootstrap resampled at the PAIR level (the
    * same deterministic md5 draw as [[graft.ops.Bootstrap]] — one
    * weight per (quad, replicate), applied to BOTH systems, so each
    * replicate compares the systems on the same resampled test set),
    * per-replicate corpus-BLEU deltas recomputed from the weighted
    * per-pair gram sums. Entirely in integers (the [[bleu4Corpus]]
    * log2fp spelling), so the whole test replays hash-exactly.
    *
    * Input convention (Euclidean mod 4 on doc_id): slot 0 = system A
    * candidate, slot 1 = the shared reference, slot 2 = system B
    * candidate, slot 3 unused. A quad enters the test when all three
    * sides have ≥ 1 word (the corpus-BLEU both-sides rule, extended).
    *
    * Output is ONE row: `n_quads` scored pairs; full-corpus scores
    * `score_a`/`score_b` and their delta `delta_full` (log2fp×4 units
    * — monotone in BLEU, so sign and ordering carry over); `n_boot`
    * surviving replicates (a replicate is dropped when either system's
    * corpus score is NULL there — zero overlap at some order under raw
    * counts, or total multiplicity 0); `wins_a`/`wins_b`/`ties`
    * replicate-delta signs (the win rate is the bootstrap p-value's
    * complement); `delta_lo`/`delta_hi` the exact order statistics at
    * `loPct`/`hiPct` over surviving deltas (index ⌈p·n_boot⌉, the
    * [[graft.ops.Bootstrap]] convention — a CI excluding 0 is the
    * standard significance call).
    *
    * Scale shape: the [[bleu4Corpus]] gram pipeline with three
    * conditional sums instead of two (one scan, two combined
    * shuffles), a quad-partitioned window for the inclusion rule
    * (single-consumer, the scan-ratchet lesson), then the replicate
    * explode runs on the per-(quad, n) AGGREGATE frame — 8·(B+1) rows
    * per quad of pure integer arithmetic, one (replicate, system,
    * order) hash aggregation, and O(B) driver-free order statistics.
    * The full-corpus score rides the same pipeline as the weight-1
    * replicate b = −1. */
  /** The shared paired-bootstrap quad skeleton — from a side-tagged
    * gram frame (quad_id, slot ∈ {0 = sys A, 1 = ref, 2 = sys B}, n,
    * g) to the per-(replicate, system, order) weighted corpus sums:
    * per-quad clipped counts, the all-three-slots inclusion rule as a
    * quad-partitioned window on the AGGREGATE frame (no second pass
    * over the gram pipeline), the two systems stacked as side-tagged
    * rows, the replicate explode with ONE paired Poisson weight per
    * (quad, replicate) — [[graft.ops.Bootstrap]]'s md5 draw, applied
    * to BOTH systems so each replicate compares them on the same
    * resampled test set; b = −1 is the weight-1 full-corpus face —
    * and the map-side-combined (b, sys, n) aggregation. ONE spelling
    * for [[bleu4PairedBootstrap]] and [[chrFPairedBootstrap]]
    * (pairedBsCtes is the DuckDB twin). Output: (b, sys, n, cl, ct,
    * rt, nq). */
  private def pairedBsWeightedSums(perQuadN: DataFrame, b: Int): DataFrame = {
    // the quad kernel already applied the all-three-slots inclusion
    // rule (a slot's 1-gram count is ≥ 1 iff its gram array was
    // non-empty), so the quad-partitioned window of the exploded
    // spelling — a whole extra shuffle — is gone
    perQuadN
      // replicate explode FIRST, system explode second: the md5 draw
      // depends only on (quad, b), so evaluating it before the 2-way
      // system fan-out halves the digest count (same value per sys)
      .withColumn("b", explode(expr(s"sequence(-1, ${b - 1})")))
      .withColumn("m", when(col("b") === -1, 1)
        .otherwise(graft.ops.Bootstrap.multiplicity("quad_id")))
      .select(col("quad_id"), col("n"), col("r_total"), col("b"), col("m"),
        explode(array(
          struct(lit(0).as("sys"), col("clipped_a").as("clipped"),
            col("a_total").as("c_total")),
          struct(lit(1).as("sys"), col("clipped_b").as("clipped"),
            col("b_total").as("c_total")))).as("sc"))
      .select(col("quad_id"), col("n"), col("r_total"), col("b"), col("m"),
        col("sc.sys").as("sys"), col("sc.clipped").as("clipped"),
        col("sc.c_total").as("c_total"))
      .groupBy(col("b"), col("sys"), col("n"))
      .agg(sum(col("m") * col("clipped")).as("cl"),
        sum(col("m") * col("c_total")).as("ct"),
        sum(col("m") * col("r_total")).as("rt"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("nq"))
  }

  def bleu4PairedBootstrap(docs: DataFrame, b: Int = 100, fbits: Int = 20,
      loPct: Double = 0.025, hiPct: Double = 0.975): DataFrame = {
    require(b >= 2 && loPct > 0 && hiPct < 1 && loPct < hiPct)
    val spark = docs.sparkSession
    import spark.implicits._
    val perQuadN = quadKernelCounts(PairedText.quadTexts(docs),
      PairGramKernel.wordGrams(_, 1, 4, 0))
    val withQ = pairedBsWeightedSums(perQuadN, b)
      .select(col("b").cast("int").as("b"), col("sys").cast("int").as("sys"),
        col("n").cast("int").as("n"), col("cl"), col("ct"), col("rt"),
        col("nq"))
      .as[(Int, Int, Int, Long, Long, Long, Long)]
      .map { case (bb, sys, n, cl, ct, rt, nq) =>
        val q: Option[Long] =
          if (ct >= 1 && cl >= 1) Some(FixedLog.log2fp(cl, ct, fbits))
          else None
        (bb, sys, n, cl, ct, rt, nq, q)
      }
      .toDF("b", "sys", "n", "cl", "ct", "rt", "nq", "qln")
    val perSys = withQ.groupBy(col("b"), col("sys"))
      .agg(
        max(when(col("n") === 1, col("ct"))).as("c_len"),
        max(when(col("n") === 1, col("rt"))).as("r_len"),
        max(when(col("n") === 1, col("nq"))).as("nq"),
        sum(col("qln")).as("sum_qln"),
        count(col("qln")).as("n_qln"))
      .withColumn("bp_log2fp", bpLog2fpCol(fbits))
      .withColumn("score", when(col("n_qln") === 4,
        col("sum_qln") + lit(4L) * col("bp_log2fp")))
    val perB = perSys.groupBy(col("b"))
      .agg(max(when(col("sys") === 0, col("score"))).as("score_a"),
        max(when(col("sys") === 1, col("score"))).as("score_b"),
        max(when(col("sys") === 0, col("nq"))).as("nq"))
      .withColumn("delta", col("score_a") - col("score_b"))
    pairedBsRollup(perB, "score_a", "score_b", loPct, hiPct)
  }

  /** The ONE full-face + CI rollup shared by [[bleu4PairedBootstrap]]
    * and [[chrFPairedBootstrap]] — a SINGLE pass over the
    * (b+2)-row per-replicate frame: the b = −1 full-corpus row pivots
    * out with conditional maxes and the bootstrap rows rank inside a
    * partitioned window, all in one aggregation. (The first spelling
    * cross-joined a full branch with a CI branch, which re-executed
    * the whole gram pipeline per branch — 2 scans and a
    * BroadcastNestedLoopJoin for nothing; the DuckDB mirrors keep the
    * two-CTE cross join, where the CTE is materialized once.) */
  private def pairedBsRollup(perB: DataFrame, aName: String, bName: String,
      loPct: Double, hiPct: Double): DataFrame = {
    val isB = col("b") >= 0 && col("delta").isNotNull
    val ranked = perB
      .withColumn("_isb", isB)
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("_isb").orderBy(col("delta"), col("b"))))
      .withColumn("_cnt", sum(when(col("_isb"), 1L).otherwise(0L)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    ranked.agg(
      max(when(col("b") === -1, col("nq"))).as("n_quads"),
      max(when(col("b") === -1, col(aName))).as(aName),
      max(when(col("b") === -1, col(bName))).as(bName),
      max(when(col("b") === -1, col("delta"))).as("delta_full"),
      sum(when(col("_isb"), 1L).otherwise(0L)).as("n_boot"),
      sum(when(col("_isb") && col("delta") > 0, 1L).otherwise(0L))
        .as("wins_a"),
      sum(when(col("_isb") && col("delta") < 0, 1L).otherwise(0L))
        .as("wins_b"),
      sum(when(col("_isb") && col("delta") === 0, 1L).otherwise(0L))
        .as("ties"),
      max(when(col("_isb") &&
        col("_r") === ceil(lit(loPct) * col("_cnt")), col("delta")))
        .as("delta_lo"),
      max(when(col("_isb") &&
        col("_r") === ceil(lit(hiPct) * col("_cnt")), col("delta")))
        .as("delta_hi"))
      // an all-excluded corpus has no b = -1 row: emit ZERO rows, the
      // SQL mirrors' empty-full-CTE behavior; and when NO replicate
      // scored (n_boot = 0) the win/tie counters are NULL — the
      // mirrors' SUM-over-empty — not 0
      .filter(col("n_quads").isNotNull)
      .select(col("n_quads"), col(aName), col(bName), col("delta_full"),
        col("n_boot"),
        when(col("n_boot") > 0, col("wins_a")).as("wins_a"),
        when(col("n_boot") > 0, col("wins_b")).as("wins_b"),
        when(col("n_boot") > 0, col("ties")).as("ties"),
        col("delta_lo"), col("delta_hi"))
  }

  /** DuckDB twin of [[pairedBsWeightedSums]] — the `<p>_qg` … `<p>_bn`
    * CTE chain over a gram CTE named `<p>_g` exposing (quad_id, slot,
    * n, g); no leading WITH, no trailing comma. */
  private def pairedBsCtes(p: String, b: Int): String =
    s"""${p}_qg AS (SELECT quad_id, n, g,
       |  CAST(SUM(CASE WHEN slot = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
       |  CAST(SUM(CASE WHEN slot = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
       |  CAST(SUM(CASE WHEN slot = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM ${p}_g GROUP BY 1, 2, 3),
       |${p}_qn AS (SELECT quad_id, n,
       |  CAST(SUM(LEAST(a_cnt, r_cnt)) AS BIGINT) AS clipped_a,
       |  CAST(SUM(LEAST(b_cnt, r_cnt)) AS BIGINT) AS clipped_b,
       |  CAST(SUM(a_cnt) AS BIGINT) AS a_total,
       |  CAST(SUM(b_cnt) AS BIGINT) AS b_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total
       |  FROM ${p}_qg GROUP BY 1, 2),
       |${p}_inc AS (SELECT quad_id FROM ${p}_qn GROUP BY 1
       |  HAVING MAX(CASE WHEN n = 1 THEN a_total END) >= 1
       |     AND MAX(CASE WHEN n = 1 THEN b_total END) >= 1
       |     AND MAX(CASE WHEN n = 1 THEN r_total END) >= 1),
       |${p}_sys AS (
       |  SELECT p.quad_id, p.n, p.r_total, s.sys,
       |    CASE WHEN s.sys = 0 THEN p.clipped_a ELSE p.clipped_b END AS clipped,
       |    CASE WHEN s.sys = 0 THEN p.a_total ELSE p.b_total END AS c_total
       |  FROM ${p}_qn p JOIN ${p}_inc q ON q.quad_id = p.quad_id,
       |       (VALUES (0), (1)) s(sys)),
       |${p}_rep AS (
       |  SELECT quad_id, n, r_total, sys, clipped, c_total, reps.b,
       |    CASE WHEN reps.b = -1 THEN 1
       |         ELSE ${graft.ops.Bootstrap.multiplicitySql("quad_id")} END AS m
       |  FROM ${p}_sys,
       |       (SELECT unnest(generate_series(-1, ${b - 1})) AS b) reps),
       |${p}_bn AS (SELECT b, sys, n,
       |  CAST(SUM(m * clipped) AS BIGINT) AS cl,
       |  CAST(SUM(m * c_total) AS BIGINT) AS ct,
       |  CAST(SUM(m * r_total) AS BIGINT) AS rt,
       |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nq
       |  FROM ${p}_rep GROUP BY 1, 2, 3)""".stripMargin

  /** DuckDB mirror of [[bleu4PairedBootstrap]]. */
  def bleu4PairedBootstrapSql(b: Int = 100, fbits: Int = 20,
      loPct: Double = 0.025, hiPct: Double = 0.975,
      from: String = "documents"): String = {
    val (logCtes, logLast) = DuckHash.log2fpRowCtes(
      "pb_lsrc", Seq("b", "sys", "n"), "cl", "ct", "pblg", fbits)
    val bp = s"CASE WHEN c_len >= r_len THEN 0 ELSE " +
      s"-CAST(((r_len - c_len)::HUGEINT * ${1L << fbits} * 1000000) // " +
      s"(c_len::HUGEINT * $Ln2E6) AS BIGINT) END"
    s"""WITH pb_ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $from
       |  WHERE text IS NOT NULL AND ((doc_id % 4) + 4) % 4 < 3),
       |pb_g AS (
       |  SELECT doc_id - (((doc_id % 4) + 4) % 4) AS quad_id,
       |         ((doc_id % 4) + 4) % 4 AS slot, tn.n AS n,
       |         md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM pb_ws, unnest([1, 2, 3, 4]) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |${pairedBsCtes("pb", b)},
       |pb_lsrc AS (SELECT b, sys, n, cl, ct FROM pb_bn
       |  WHERE ct >= 1 AND cl >= 1)$logCtes,
       |pb_bs AS (SELECT p.b, p.sys,
       |  MAX(CASE WHEN p.n = 1 THEN p.ct END) AS c_len,
       |  MAX(CASE WHEN p.n = 1 THEN p.rt END) AS r_len,
       |  MAX(CASE WHEN p.n = 1 THEN p.nq END) AS nq,
       |  CAST(SUM(l.ql) AS BIGINT) AS sum_qln,
       |  COUNT(l.ql) AS n_qln
       |  FROM pb_bn p LEFT JOIN $logLast l
       |    ON l.b = p.b AND l.sys = p.sys AND l.n = p.n
       |  GROUP BY 1, 2),
       |pb_sc AS (SELECT b, sys, nq,
       |  CASE WHEN n_qln = 4 THEN CAST(sum_qln + 4 * ($bp) AS BIGINT)
       |  END AS score
       |  FROM pb_bs),
       |pb_d AS (SELECT b,
       |  MAX(CASE WHEN sys = 0 THEN score END) AS score_a,
       |  MAX(CASE WHEN sys = 1 THEN score END) AS score_b,
       |  MAX(CASE WHEN sys = 0 THEN nq END) AS nq,
       |  MAX(CASE WHEN sys = 0 THEN score END)
       |    - MAX(CASE WHEN sys = 1 THEN score END) AS delta
       |  FROM pb_sc GROUP BY 1),
       |pb_full AS (SELECT nq AS n_quads, score_a, score_b,
       |  delta AS delta_full FROM pb_d WHERE b = -1),
       |pb_rank AS (
       |  SELECT *, row_number() OVER (ORDER BY delta, b) AS r,
       |    COUNT(*) OVER () AS cnt
       |  FROM pb_d WHERE b >= 0 AND delta IS NOT NULL),
       |pb_ci AS (SELECT
       |  CAST(COUNT(*) AS BIGINT) AS n_boot,
       |  CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
       |  CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS wins_b,
       |  CAST(SUM(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties,
       |  MAX(CASE WHEN r = CAST(ceil(CAST($loPct AS DOUBLE) * cnt) AS BIGINT)
       |      THEN delta END) AS delta_lo,
       |  MAX(CASE WHEN r = CAST(ceil(CAST($hiPct AS DOUBLE) * cnt) AS BIGINT)
       |      THEN delta END) AS delta_hi
       |  FROM pb_rank)
       |SELECT f.n_quads, f.score_a, f.score_b, f.delta_full,
       |  c.n_boot, c.wins_a, c.wins_b, c.ties, c.delta_lo, c.delta_hi
       |FROM pb_full f, pb_ci c""".stripMargin
  }

  /** Paired-bootstrap significance for corpus chrF — sacrebleu's
    * `paired-bs` applied to its second headline metric: the same quad
    * layout and ONE-weight-per-(quad, replicate) Poisson draw as
    * [[bleu4PairedBootstrap]] (identical inclusion/window/explode
    * skeleton), but the replicate score is corpus chrF — per-order
    * F_β from the weighted corpus sums, populated-components mean
    * (the [[chrFCorpus]] statistic) — so there is no log/brevity
    * machinery at all: the whole test is rationals of longs and the
    * gate replays hash-exactly. b = −1 is the weight-1 full-corpus
    * face; quads need ≥ 1 stripped char in ALL of slots 0/1/2.
    * Output: ONE row — full scores + delta, win/tie counts, exact
    * -order-statistic delta CI. */
  def chrFPairedBootstrap(docs: DataFrame, b: Int = 100, beta2: Int = 4,
      maxN: Int = 6, loPct: Double = 0.025,
      hiPct: Double = 0.975): DataFrame = {
    require(b >= 2 && loPct > 0 && hiPct < 1 && loPct < hiPct)
    val perQuadN = quadKernelCounts(PairedText.quadTexts(docs),
      PairGramKernel.charGrams(_, maxN))
    val perRep = pairedBsWeightedSums(perQuadN, b)
      .withColumn("f_e6",
        when(col("ct") >= 1 && col("rt") >= 1, expr(
          s"CAST(${1 + beta2} AS DECIMAL(38,0)) * cl * 1000000 div " +
            s"($beta2 * rt + ct)")))
    val perSys = perRep.groupBy(col("b"), col("sys"))
      .agg(
        max(when(col("n") === 1, col("nq"))).as("nq"),
        sum(when(col("f_e6").isNotNull, 1L).otherwise(0L)).as("n_orders"),
        sum(col("f_e6")).as("sum_f"))
      .withColumn("score",
        when(col("n_orders") >= 1,
          expr("CAST(sum_f div n_orders AS BIGINT)")))
    val perB = perSys.groupBy(col("b"))
      .agg(max(when(col("sys") === 0, col("score"))).as("chrf_a"),
        max(when(col("sys") === 1, col("score"))).as("chrf_b"),
        max(when(col("sys") === 0, col("nq"))).as("nq"))
      .withColumn("delta", col("chrf_a") - col("chrf_b"))
    pairedBsRollup(perB, "chrf_a", "chrf_b", loPct, hiPct)
  }

  /** DuckDB mirror of [[chrFPairedBootstrap]]. */
  def chrFPairedBootstrapSql(b: Int = 100, beta2: Int = 4, maxN: Int = 6,
      loPct: Double = 0.025, hiPct: Double = 0.975,
      from: String = "documents"): String = {
    s"""WITH cb_ws AS (
       |  SELECT doc_id, replace(text, ' ', '') AS s FROM $from
       |  WHERE text IS NOT NULL AND length(replace(text, ' ', '')) >= 1
       |    AND ((doc_id % 4) + 4) % 4 < 3),
       |cb_g AS (
       |  SELECT doc_id - (((doc_id % 4) + 4) % 4) AS quad_id,
       |         ((doc_id % 4) + 4) % 4 AS slot, tn.n AS n,
       |         md5(substr(s, i, tn.n)) AS g
       |  FROM cb_ws, unnest(generate_series(1, $maxN)) tn(n),
       |       unnest(generate_series(1, length(s) - tn.n + 1)) t(i)
       |  WHERE length(s) >= tn.n),
       |${pairedBsCtes("cb", b)},
       |cb_f AS (SELECT b, sys, n, nq,
       |  CASE WHEN ct >= 1 AND rt >= 1 THEN
       |    CAST((${1 + beta2}::HUGEINT * cl * 1000000) //
       |         ($beta2 * rt + ct) AS BIGINT)
       |  END AS f_e6
       |  FROM cb_bn),
       |cb_sc AS (SELECT b, sys,
       |  MAX(CASE WHEN n = 1 THEN nq END) AS nq,
       |  CASE WHEN SUM(CASE WHEN f_e6 IS NOT NULL THEN 1 ELSE 0 END) >= 1
       |       THEN CAST(CAST(SUM(f_e6) AS HUGEINT) //
       |            SUM(CASE WHEN f_e6 IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT)
       |  END AS score
       |  FROM cb_f GROUP BY 1, 2),
       |cb_d AS (SELECT b,
       |  MAX(CASE WHEN sys = 0 THEN score END) AS chrf_a,
       |  MAX(CASE WHEN sys = 1 THEN score END) AS chrf_b,
       |  MAX(CASE WHEN sys = 0 THEN nq END) AS nq,
       |  MAX(CASE WHEN sys = 0 THEN score END)
       |    - MAX(CASE WHEN sys = 1 THEN score END) AS delta
       |  FROM cb_sc GROUP BY 1),
       |cb_full AS (SELECT nq AS n_quads, chrf_a, chrf_b,
       |  delta AS delta_full FROM cb_d WHERE b = -1),
       |cb_rank AS (
       |  SELECT *, row_number() OVER (ORDER BY delta, b) AS r,
       |    COUNT(*) OVER () AS cnt
       |  FROM cb_d WHERE b >= 0 AND delta IS NOT NULL),
       |cb_ci AS (SELECT
       |  CAST(COUNT(*) AS BIGINT) AS n_boot,
       |  CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
       |  CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS wins_b,
       |  CAST(SUM(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties,
       |  MAX(CASE WHEN r = CAST(ceil(CAST($loPct AS DOUBLE) * cnt) AS BIGINT)
       |      THEN delta END) AS delta_lo,
       |  MAX(CASE WHEN r = CAST(ceil(CAST($hiPct AS DOUBLE) * cnt) AS BIGINT)
       |      THEN delta END) AS delta_hi
       |  FROM cb_rank)
       |SELECT f.n_quads, f.chrf_a, f.chrf_b, f.delta_full,
       |  c.n_boot, c.wins_a, c.wins_b, c.ties, c.delta_lo, c.delta_hi
       |FROM cb_full f, cb_ci c""".stripMargin
  }

  /** SQuAD-style answer-eval pair: per (even, odd) doc pair the
    * token-bag F1 (2·Σ min(c(t), r(t)) / (c_len + r_len) — the chrF
    * rational-of-longs cancellation at word unigrams) and EXACT MATCH
    * (text equality, compared as hash equality so full texts never
    * shuffle — xxhash64 here, md5 in the oracle, collision-equality
    * convention). ONE scan and two shuffles, zero joins: the whole
    * -text hash rides the gram explode as a tagged MARKER element
    * (low packed bits 1000 — a unigram's are 0001, so the two can
    * never meet in a group; the oracle's marker is 'T'||md5(text),
    * length-disjoint from gram md5s), and exact_match is just "does
    * any marker group have both sides". A NULL text contributes no
    * rows at all (absent side, the eval-family convention: the gram
    * array is NULL, so concat propagates NULL and explode drops). */
  def tokenF1(docs: DataFrame): DataFrame =
    tokenF1PerKey(PairedText.paired(docs), Seq("pair_id"))

  /** The keyed token-F1 core — see [[chrFPerKey]] for the key
    * contract. The whole-text marker rides the kernel's gram array as
    * the same tagged element (xxhash64 << 4 | 8) the exploded
    * spelling used, so exact_match keeps hash-equality semantics: the
    * marker's clipped count is ≥ 1 iff both sides' hashes collide. */
  private[text] def tokenF1PerKey(paired: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    pairKernelCounts(paired, keyCols, PairGramKernel.tokenF1Grams)
      .groupBy(keys: _*)
      .agg(
        sum(when(col("n") === 1, col("clipped")).otherwise(0L)).as("clipped"),
        sum(when(col("n") === 1, col("c_total")).otherwise(0L)).as("c_total"),
        sum(when(col("n") === 1, col("r_total")).otherwise(0L)).as("r_total"),
        max(when(col("n") === 8 && col("clipped") >= 1, 1L).otherwise(0L))
          .as("exact_match"))
      .filter(col("c_total") >= 1 && col("r_total") >= 1)
      .select(keys ++ Seq(col("clipped"), col("c_total"), col("r_total"),
        expr("CAST(2 * clipped * 1000000 div (c_total + r_total) AS BIGINT)")
          .as("token_f1_e6"),
        col("exact_match")): _*)
  }

  /** DuckDB mirror of [[tokenF1]]. */
  def tokenF1Sql(from: String = "documents"): String =
    tokenF1PerKeySql(Seq("pair_id"), PairedText.sidedSql(from))

  /** DuckDB mirror of [[tokenF1PerKey]] — `sidedFrom` must be a
    * parenthesized relation exposing `keyCols` + (side, text). */
  private[text] def tokenF1PerKeySql(keyCols: Seq[String],
      sidedFrom: String): String = {
    val ks = keyCols.mkString(", ")
    s"""WITH tf_ws AS (
       |  SELECT $ks, side, text, string_split(text, ' ') AS ws
       |  FROM $sidedFrom sd WHERE text IS NOT NULL),
       |tf_g AS (
       |  SELECT $ks, side, md5(ws[i]) AS g
       |  FROM tf_ws, unnest(generate_series(1, len(ws))) t(i)
       |  UNION ALL
       |  SELECT $ks, side, 'T' || md5(text)
       |  FROM tf_ws),
       |tf_pg AS (SELECT $ks, g,
       |  CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |  CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM tf_g GROUP BY $ks, g)
       |SELECT $ks,
       |  CAST(SUM(CASE WHEN g NOT LIKE 'T%' THEN LEAST(c_cnt, r_cnt)
       |           ELSE 0 END) AS BIGINT) AS clipped,
       |  CAST(SUM(CASE WHEN g NOT LIKE 'T%' THEN c_cnt ELSE 0 END)
       |       AS BIGINT) AS c_total,
       |  CAST(SUM(CASE WHEN g NOT LIKE 'T%' THEN r_cnt ELSE 0 END)
       |       AS BIGINT) AS r_total,
       |  CAST((2::HUGEINT * SUM(CASE WHEN g NOT LIKE 'T%'
       |         THEN LEAST(c_cnt, r_cnt) ELSE 0 END) * 1000000)
       |       // SUM(CASE WHEN g NOT LIKE 'T%' THEN c_cnt + r_cnt ELSE 0 END)
       |       AS BIGINT) AS token_f1_e6,
       |  CAST(MAX(CASE WHEN g LIKE 'T%' AND c_cnt >= 1 AND r_cnt >= 1
       |           THEN 1 ELSE 0 END) AS BIGINT) AS exact_match
       |FROM tf_pg GROUP BY $ks
       |HAVING SUM(CASE WHEN g NOT LIKE 'T%' THEN c_cnt ELSE 0 END) >= 1
       |   AND SUM(CASE WHEN g NOT LIKE 'T%' THEN r_cnt ELSE 0 END) >= 1""".stripMargin
  }

  /** chrF (Popović 2015) — character-n-gram F-β over the same
    * (even, odd) pairs, the third eval face: whitespace stripped,
    * char n-grams of orders 1..`maxN` counted WITH multiplicity and
    * clipped like [[bleu4]], then per order
    *   F_β = (1+β²)·P·R / (β²·P + R) = (1+β²)·clipped / (β²·r_total + c_total)
    * (the P = clipped/c_total, R = clipped/r_total cancellation — so
    * the WHOLE metric is one rational of longs per order, no log, no
    * float) and chrf_e6 = (Σ_n F_n·1e6) div maxN with floor division
    * on both engines. Zero-overlap orders contribute 0 naturally —
    * no NULL regime. Pairs where either side has fewer than `maxN`
    * characters after space-stripping are dropped (every order must
    * be populated on both sides, the bleu4 convention).
    *
    * Both engines window by CODEPOINT — DuckDB substr counts
    * codepoints, and the Spark side's [[graft.functions.GramHash]]
    * kernel decodes the string to codepoints before windowing
    * (surrogate pairs collapse to one symbol; GramHashesSpec pins
    * gram-identity against the substring spelling on astral-plane
    * fixtures) — so the boundary holds on the full Unicode domain,
    * not just the BMP. Scale shape: identical to [[bleu4]] — one
    * scan, one Generate for all orders at O(1) per (position, order)
    * with zero per-gram allocation (the r13.10 rolling-hash plan),
    * three combined key shuffles; the per-order F is a plain column
    * expression (no typed map needed). */
  def chrF(docs: DataFrame, beta2: Int = 4, maxN: Int = 6): DataFrame =
    chrFPerKey(PairedText.paired(docs), Seq("pair_id"), beta2, maxN)

  /** chrF with the REDUCED-orders fallback — the r14 verdict's option
    * 8: instead of DROPPING pairs with a side under maxN chars (the
    * shipped chrF contract, which WMT-style corpora with single-word
    * segments would thin out), the F-β mean runs over the POPULATED
    * orders only (sacrebleu's effective behavior of averaging the
    * components that exist), exposed as `n_orders` + `chrf_e6` so a
    * consumer can see how many components backed each score. Offered
    * as a VARIANT gate; the shipped eval_chrf contract is unchanged.
    * Only pairs with zero populated orders (an absent side) drop. */
  def chrFReduced(docs: DataFrame, beta2: Int = 4, maxN: Int = 6): DataFrame =
    chrFPerKey(PairedText.paired(docs), Seq("pair_id"), beta2, maxN,
      reducedOrders = true)

  /** DuckDB mirror of [[chrFReduced]]. */
  def chrFReducedSql(beta2: Int = 4, maxN: Int = 6,
      from: String = "documents"): String =
    chrFPerKeySql(Seq("pair_id"), PairedText.sidedSql(from), beta2, maxN,
      reducedOrders = true)

  /** CORPUS-level chrF over the (even, odd) pairs — sacrebleu's
    * `corpus_chrf`: per gram order the clipped/candidate/reference
    * counts SUM across the corpus BEFORE the F_β ratio (micro
    * average — a mean of segment chrF scores is the macro statistic,
    * a different number), then the same F-mean over orders. The
    * [[bleu4Corpus]] twin on the char-gram pipeline. Pairs with both
    * sides present (≥ 1 char after space-stripping) contribute; a
    * short side's missing orders add 0 grams (the sacrebleu
    * convention — no per-pair minimum-length drop at corpus level);
    * orders with an empty corpus-wide side drop from the mean
    * (`n_orders` reported). Output is ONE row. Scale shape: the
    * [[chrFPerKey]] gram plan, a pair-partitioned window for the
    * both-sides filter (keeps the gram frame single-consumer — the
    * scan-ratchet lesson), then a ≤maxN-row corpus rollup. */
  def chrFCorpus(docs: DataFrame, beta2: Int = 4, maxN: Int = 6): DataFrame =
    chrFCorpusRollup(chrFCounts(PairedText.paired(docs), Seq("pair_id"), maxN),
      beta2, wordCols = false, "chrf_e6")

  /** The ONE corpus micro rollup shared by [[chrFCorpus]] and
    * [[chrFppCorpus]]: the both-sides-present filter as a
    * pair-partitioned window over the counts frame (the gram frame
    * stays single-consumer), per-order corpus sums, F_β per populated
    * order, component mean. `wordCols` adds the chrF++ word-unigram
    * length columns (kernel tag n = 9). */
  private def chrFCorpusRollup(counts: DataFrame, beta2: Int,
      wordCols: Boolean, outName: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("pair_id")
    val byN = counts
      .withColumn("c_chars_p",
        max(when(col("n") === 1, col("c_total"))).over(w))
      .withColumn("r_chars_p",
        max(when(col("n") === 1, col("r_total"))).over(w))
      .filter(col("c_chars_p") >= 1 && col("r_chars_p") >= 1)
      .groupBy(col("n"))
      .agg(sum(col("clipped")).as("clipped"),
        sum(col("c_total")).as("c_total"),
        sum(col("r_total")).as("r_total"),
        count(lit(1)).as("n_pairs_n"))
      .withColumn("f_e6",
        when(col("c_total") >= 1 && col("r_total") >= 1, expr(
          s"CAST(${1 + beta2} AS DECIMAL(38,0)) * clipped * 1000000 div " +
            s"($beta2 * r_total + c_total)")))
    val base = Seq(
      max(when(col("n") === 1, col("n_pairs_n"))).as("n_pairs"),
      max(when(col("n") === 1, col("c_total"))).as("c_chars"),
      max(when(col("n") === 1, col("r_total"))).as("r_chars"))
    val words =
      if (wordCols) Seq(
        max(when(col("n") === 9, col("c_total"))).as("c_words"),
        max(when(col("n") === 9, col("r_total"))).as("r_words"))
      else Nil
    val aggs = base ++ words ++ Seq(
      sum(when(col("f_e6").isNotNull, 1L).otherwise(0L)).as("n_orders"),
      sum(col("f_e6")).as("sum_f"))
    val outs = Seq(col("n_pairs"), col("c_chars"), col("r_chars")) ++
      (if (wordCols) Seq(col("c_words"), col("r_words")) else Nil) ++
      Seq(col("n_orders"),
        expr("CAST(sum_f div n_orders AS BIGINT)").as(outName))
    byN.agg(aggs.head, aggs.tail: _*).select(outs: _*)
  }

  /** DuckDB twin of [[chrFCorpusRollup]] — the paired/per-order/final
    * CTE chain over a counts CTE named `<cnt>` exposing (pair_id, n,
    * clipped, c_total, r_total); word orders tag as n = 101 in SQL. */
  private def chrFCorpusRollupSql(cnt: String, p: String, beta2: Int,
      wordCols: Boolean, outName: String): String = {
    val words =
      if (wordCols)
        s"""|  MAX(CASE WHEN n = 101 THEN c_total END) AS c_words,
            |  MAX(CASE WHEN n = 101 THEN r_total END) AS r_words,""".stripMargin
      else ""
    s"""${p}_paired AS (SELECT pair_id FROM $cnt GROUP BY 1
       |  HAVING MAX(CASE WHEN n = 1 THEN c_total END) >= 1
       |     AND MAX(CASE WHEN n = 1 THEN r_total END) >= 1),
       |${p}_n AS (SELECT p.n,
       |  CAST(SUM(p.clipped) AS BIGINT) AS clipped,
       |  CAST(SUM(p.c_total) AS BIGINT) AS c_total,
       |  CAST(SUM(p.r_total) AS BIGINT) AS r_total,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs_n
       |  FROM $cnt p JOIN ${p}_paired q ON q.pair_id = p.pair_id
       |  GROUP BY 1),
       |${p}_f AS (SELECT n, clipped, c_total, r_total, n_pairs_n,
       |  CASE WHEN c_total >= 1 AND r_total >= 1 THEN
       |    CAST((${1 + beta2}::HUGEINT * clipped * 1000000) //
       |         ($beta2 * r_total + c_total) AS BIGINT)
       |  END AS f_e6
       |  FROM ${p}_n)
       |SELECT
       |  MAX(CASE WHEN n = 1 THEN n_pairs_n END) AS n_pairs,
       |  MAX(CASE WHEN n = 1 THEN c_total END) AS c_chars,
       |  MAX(CASE WHEN n = 1 THEN r_total END) AS r_chars,
       |$words
       |  CAST(SUM(CASE WHEN f_e6 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_orders,
       |  CAST(CAST(SUM(f_e6) AS HUGEINT) //
       |       SUM(CASE WHEN f_e6 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS $outName
       |FROM ${p}_f""".stripMargin
  }

  /** DuckDB mirror of [[chrFCorpus]]. */
  def chrFCorpusSql(beta2: Int = 4, maxN: Int = 6,
      from: String = "documents"): String =
    s"""WITH ${chrFCountCtes(Seq("pair_id"), PairedText.sidedSql(from), maxN)},
       |${chrFCorpusRollupSql("cf_pn", "cc", beta2,
          wordCols = false, "chrf_e6")}""".stripMargin

  /** CORPUS-level chrF++ — the number WMT system tables actually
    * carry (sacrebleu corpus chrF++, word_order 2): all 8 component
    * counts (6 char + 2 word orders) SUM across the corpus before
    * their F_β ratios, then the component mean. The [[chrFCorpus]]
    * plan on the [[chrFppCounts]] frame — same pair-window filter
    * (both sides ≥ 1 char), same populated-orders mean (a single-word
    * corpus still scores its word-unigram component; `n_orders`
    * reports the backing count). One scan, one Generate, ONE row. */
  def chrFppCorpus(docs: DataFrame, beta2: Int = 4, maxN: Int = 6,
      wordN: Int = 2): DataFrame =
    chrFCorpusRollup(
      chrFppCounts(PairedText.paired(docs), Seq("pair_id"), maxN, wordN),
      beta2, wordCols = true, "chrfpp_e6")

  /** DuckDB mirror of [[chrFppCorpus]] (word orders tag as n+100 in
    * the SQL counts, the [[chrFppPerKeySql]] spelling). */
  def chrFppCorpusSql(beta2: Int = 4, maxN: Int = 6, wordN: Int = 2,
      from: String = "documents"): String =
    s"""WITH ${chrFppCountCtes(Seq("pair_id"), PairedText.sidedSql(from),
          maxN, wordN)},
       |${chrFCorpusRollupSql("cfp_pn", "cpc", beta2,
          wordCols = true, "chrfpp_e6")}""".stripMargin

  /** The keyed per-(key, order) char-gram count frame shared by
    * [[chrFPerKey]] and [[chrFCorpus]] — (keyCols..., n, clipped,
    * c_total, r_total) for char orders 1..`maxN` off one scan and two
    * map-side-combined shuffles. */
  private def chrFCounts(paired: DataFrame, keyCols: Seq[String],
      maxN: Int): DataFrame =
    pairKernelCounts(paired, keyCols, PairGramKernel.charGrams(_, maxN))

  /** The keyed chrF core — `sided` carries `keyCols` + (side, text);
    * one row per key satisfying the drop contract. The positional gate
    * keys by pair_id; [[MultiRefEval.chrF]] keys by (cand_id, ref_id)
    * so each reference scores independently before the per-candidate
    * max-F reduction (the sacrebleu multi-ref convention).
    * `reducedOrders` switches the fixed-maxN drop contract to the
    * populated-components mean (see [[chrFReduced]]). */
  private[text] def chrFPerKey(paired: DataFrame, keyCols: Seq[String],
      beta2: Int, maxN: Int, reducedOrders: Boolean = false): DataFrame = {
    val keys = keyCols.map(col)
    val perN = chrFCounts(paired, keyCols, maxN)
      // per-order F_β in e6, one rational of longs (decimal width for
      // the clipped·1e6 intermediate); orders missing a side yield
      // NULL here and the pair is dropped below
      .withColumn("f_e6",
        when(col("c_total") >= 1 && col("r_total") >= 1, expr(
          s"CAST(${1 + beta2} AS DECIMAL(38,0)) * clipped * 1000000 div " +
            s"($beta2 * r_total + c_total)")))
    val agg = perN.groupBy(keys: _*)
      .agg(
        sum(when(col("c_total") >= 1 && col("r_total") >= 1, 1).otherwise(0))
          .as("n_orders"),
        max(when(col("n") === 1, col("c_total"))).as("c_chars"),
        max(when(col("n") === 1, col("r_total"))).as("r_chars"),
        max(when(col("n") === 1, col("clipped"))).as("clipped_1"),
        max(when(col("n") === maxN, col("clipped"))).as(s"clipped_$maxN"),
        sum(col("f_e6")).as("sum_f_e6"))
    if (reducedOrders)
      agg.filter(col("n_orders") >= 1)
        .select(keys ++ Seq(col("c_chars"), col("r_chars"),
          col("n_orders").cast("long").as("n_orders"),
          expr("CAST(sum_f_e6 div n_orders AS BIGINT)").as("chrf_e6")): _*)
    else
      agg.filter(col("n_orders") === maxN)
        .select(keys ++ Seq(col("c_chars"), col("r_chars"),
          col("clipped_1"), col(s"clipped_$maxN"),
          expr(s"CAST(sum_f_e6 div $maxN AS BIGINT)").as("chrf_e6")): _*)
  }

  /** chrF++ (Popović 2017) — the WMT-reported chrF variant: the
    * arithmetic F-β mean runs over the 6 char-gram orders PLUS word
    * 1- and 2-gram orders (8 components; β²=4 throughout, same long
    * -rational algebra as [[chrF]]). Word orders are tagged 101/102 so
    * they can never collide with char orders in the (pair, n, gram)
    * aggregation; both gram families come off ONE text scan and ONE
    * Generate — the word grams carry the kernel's TAG bit, so the two
    * plain long arrays concat directly (no per-gram struct) and the
    * mixed-family order is just `e & 15` (char 1..6, word 9..10).
    * Drop convention (the chrF one, extended): every component
    * populated on both sides — ≥ maxN chars AND ≥ wordN words per
    * side; identical texts score exactly 1e6. */
  def chrFpp(docs: DataFrame, beta2: Int = 4, maxN: Int = 6,
      wordN: Int = 2): DataFrame =
    chrFppPerKey(PairedText.paired(docs), Seq("pair_id"), beta2, maxN, wordN)

  /** The keyed per-(key, order) count frame shared by [[chrFppPerKey]]
    * and [[chrFppCorpus]] — char orders tag as n = 1..maxN, word
    * orders as n = 8+1..8+wordN (the kernel's tag bit), one exploded
    * long array, one scan. */
  private def chrFppCounts(paired: DataFrame, keyCols: Seq[String],
      maxN: Int, wordN: Int): DataFrame =
    pairKernelCounts(paired, keyCols,
      PairGramKernel.chrFppGrams(_, maxN, wordN))

  /** The keyed chrF++ core — see [[chrFPerKey]] for the key contract. */
  private[text] def chrFppPerKey(paired: DataFrame, keyCols: Seq[String],
      beta2: Int, maxN: Int, wordN: Int): DataFrame = {
    val keys = keyCols.map(col)
    val nComp = maxN + wordN
    val perN = chrFppCounts(paired, keyCols, maxN, wordN)
      .withColumn("f_e6",
        when(col("c_total") >= 1 && col("r_total") >= 1, expr(
          s"CAST(${1 + beta2} AS DECIMAL(38,0)) * clipped * 1000000 div " +
            s"($beta2 * r_total + c_total)")))
    perN.groupBy(keys: _*)
      .agg(
        sum(when(col("c_total") >= 1 && col("r_total") >= 1, 1).otherwise(0))
          .as("n_orders"),
        max(when(col("n") === 1, col("c_total"))).as("c_chars"),
        max(when(col("n") === 1, col("r_total"))).as("r_chars"),
        max(when(col("n") === 9, col("c_total"))).as("c_words"),
        max(when(col("n") === 9, col("r_total"))).as("r_words"),
        max(when(col("n") === 1, col("clipped"))).as("clipped_c1"),
        max(when(col("n") === 10, col("clipped"))).as("clipped_w2"),
        sum(col("f_e6")).as("sum_f_e6"))
      .filter(col("n_orders") === nComp)
      .select(keys ++ Seq(col("c_chars"), col("r_chars"),
        col("c_words"), col("r_words"), col("clipped_c1"), col("clipped_w2"),
        expr(s"CAST(sum_f_e6 div $nComp AS BIGINT)").as("chrfpp_e6")): _*)
  }

  /** DuckDB mirror of [[chrFpp]]. */
  def chrFppSql(beta2: Int = 4, maxN: Int = 6, wordN: Int = 2,
      from: String = "documents"): String =
    chrFppPerKeySql(Seq("pair_id"), PairedText.sidedSql(from),
      beta2, maxN, wordN)

  /** The shared `cfp_src`/`cfp_g`/`cfp_pg`/`cfp_pn` CTE prelude — the
    * DuckDB twin of [[chrFppCounts]] (word orders as n+100), used by
    * [[chrFppPerKeySql]] and [[chrFppCorpusSql]]. */
  private def chrFppCountCtes(keyCols: Seq[String], sidedFrom: String,
      maxN: Int, wordN: Int): String = {
    val ks = keyCols.mkString(", ")
    s"""cfp_src AS (
       |  SELECT $ks, side,
       |         replace(text, ' ', '') AS s,
       |         string_split(text, ' ') AS ws
       |  FROM $sidedFrom sd WHERE length(replace(text, ' ', '')) >= 1),
       |cfp_g AS (
       |  SELECT $ks, side, tn.n AS n, md5(substr(s, i, tn.n)) AS g
       |  FROM cfp_src, unnest(generate_series(1, $maxN)) tn(n),
       |       unnest(generate_series(1, length(s) - tn.n + 1)) t(i)
       |  WHERE length(s) >= tn.n
       |  UNION ALL
       |  SELECT $ks, side, tn.n + 100 AS n,
       |         md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM cfp_src, unnest(generate_series(1, $wordN)) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |cfp_pg AS (SELECT $ks, n, g,
       |  CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |  CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM cfp_g GROUP BY $ks, n, g),
       |cfp_pn AS (SELECT $ks, n,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS BIGINT) AS clipped,
       |  CAST(SUM(c_cnt) AS BIGINT) AS c_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total
       |  FROM cfp_pg GROUP BY $ks, n)""".stripMargin
  }

  /** DuckDB mirror of [[chrFppPerKey]] — `sidedFrom` must be a
    * parenthesized relation exposing `keyCols` + (side, text). */
  private[text] def chrFppPerKeySql(keyCols: Seq[String], sidedFrom: String,
      beta2: Int = 4, maxN: Int = 6, wordN: Int = 2): String = {
    val nComp = maxN + wordN
    val ks = keyCols.mkString(", ")
    s"""WITH ${chrFppCountCtes(keyCols, sidedFrom, maxN, wordN)},
       |cfp_f AS (SELECT $ks, n, clipped, c_total, r_total,
       |  CASE WHEN c_total >= 1 AND r_total >= 1 THEN
       |    CAST((${1 + beta2}::HUGEINT * clipped * 1000000) //
       |         ($beta2 * r_total + c_total) AS BIGINT)
       |  END AS f_e6
       |  FROM cfp_pn)
       |SELECT $ks,
       |  MAX(CASE WHEN n = 1 THEN c_total END) AS c_chars,
       |  MAX(CASE WHEN n = 1 THEN r_total END) AS r_chars,
       |  MAX(CASE WHEN n = 101 THEN c_total END) AS c_words,
       |  MAX(CASE WHEN n = 101 THEN r_total END) AS r_words,
       |  MAX(CASE WHEN n = 1 THEN clipped END) AS clipped_c1,
       |  MAX(CASE WHEN n = 102 THEN clipped END) AS clipped_w2,
       |  CAST(CAST(SUM(f_e6) AS HUGEINT) // $nComp AS BIGINT) AS chrfpp_e6
       |FROM cfp_f GROUP BY $ks
       |HAVING SUM(CASE WHEN c_total >= 1 AND r_total >= 1 THEN 1 ELSE 0 END)
       |       = $nComp""".stripMargin
  }

  /** DuckDB mirror of [[chrF]]. */
  def chrFSql(beta2: Int = 4, maxN: Int = 6,
      from: String = "documents"): String =
    chrFPerKeySql(Seq("pair_id"), PairedText.sidedSql(from), beta2, maxN)

  /** The shared `cf_ws`/`cf_g`/`cf_pg`/`cf_pn` CTE prelude (no leading
    * WITH, no trailing comma) — the DuckDB twin of [[chrFCounts]],
    * used by [[chrFPerKeySql]] and [[chrFCorpusSql]] so a gram or
    * count change cannot de-synchronize the mirrors. */
  private def chrFCountCtes(keyCols: Seq[String], sidedFrom: String,
      maxN: Int): String = {
    val ks = keyCols.mkString(", ")
    s"""cf_ws AS (
       |  SELECT $ks, side, replace(text, ' ', '') AS s
       |  FROM $sidedFrom sd WHERE length(replace(text, ' ', '')) >= 1),
       |cf_g AS (
       |  SELECT $ks, side, tn.n AS n,
       |         md5(substr(s, i, tn.n)) AS g
       |  FROM cf_ws, unnest(generate_series(1, $maxN)) tn(n),
       |       unnest(generate_series(1, length(s) - tn.n + 1)) t(i)
       |  WHERE length(s) >= tn.n),
       |cf_pg AS (SELECT $ks, n, g,
       |  CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |  CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM cf_g GROUP BY $ks, n, g),
       |cf_pn AS (SELECT $ks, n,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS BIGINT) AS clipped,
       |  CAST(SUM(c_cnt) AS BIGINT) AS c_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total
       |  FROM cf_pg GROUP BY $ks, n)""".stripMargin
  }

  /** DuckDB mirror of [[chrFPerKey]] — `sidedFrom` must be a
    * parenthesized relation exposing `keyCols` + (side, text). */
  private[text] def chrFPerKeySql(keyCols: Seq[String], sidedFrom: String,
      beta2: Int = 4, maxN: Int = 6, reducedOrders: Boolean = false): String = {
    val ks = keyCols.mkString(", ")
    val out =
      if (reducedOrders)
        s"""|  CAST(SUM(CASE WHEN c_total >= 1 AND r_total >= 1
            |       THEN 1 ELSE 0 END) AS BIGINT) AS n_orders,
            |  CAST(CAST(SUM(f_e6) AS HUGEINT) //
            |       SUM(CASE WHEN c_total >= 1 AND r_total >= 1
            |           THEN 1 ELSE 0 END) AS BIGINT) AS chrf_e6
            |FROM cf_f GROUP BY $ks
            |HAVING SUM(CASE WHEN c_total >= 1 AND r_total >= 1
            |       THEN 1 ELSE 0 END) >= 1""".stripMargin
      else
        s"""|  MAX(CASE WHEN n = 1 THEN clipped END) AS clipped_1,
            |  MAX(CASE WHEN n = $maxN THEN clipped END) AS clipped_$maxN,
            |  CAST(CAST(SUM(f_e6) AS HUGEINT) // $maxN AS BIGINT) AS chrf_e6
            |FROM cf_f GROUP BY $ks
            |HAVING SUM(CASE WHEN c_total >= 1 AND r_total >= 1 THEN 1 ELSE 0 END)
            |       = $maxN""".stripMargin
    s"""WITH ${chrFCountCtes(keyCols, sidedFrom, maxN)},
       |cf_f AS (SELECT $ks, n, clipped, c_total, r_total,
       |  CASE WHEN c_total >= 1 AND r_total >= 1 THEN
       |    CAST((${1 + beta2}::HUGEINT * clipped * 1000000) //
       |         ($beta2 * r_total + c_total) AS BIGINT)
       |  END AS f_e6
       |  FROM cf_pn)
       |SELECT $ks,
       |  MAX(CASE WHEN n = 1 THEN c_total END) AS c_chars,
       |  MAX(CASE WHEN n = 1 THEN r_total END) AS r_chars,
       |$out""".stripMargin
  }

  /** DuckDB mirror of [[bleu4]]. */
  def bleu4Sql(fbits: Int = 20, from: String = "documents"): String = {
    val (logCtes, logLast) = DuckHash.log2fpRowCtes(
      "b4_lsrc", Seq("pair_id", "n"), "cs", "ts", "b4lg", fbits)
    val bp = s"CASE WHEN c_len >= r_len THEN 0 ELSE " +
      s"-CAST(((r_len - c_len)::HUGEINT * ${1L << fbits} * 1000000) // " +
      s"(c_len::HUGEINT * $Ln2E6) AS BIGINT) END"
    s"""WITH b4_ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $from),
       |b4_g AS (
       |  SELECT doc_id - (((doc_id % 2) + 2) % 2) AS pair_id,
       |         ((doc_id % 2) + 2) % 2 AS side, tn.n AS n,
       |         md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM b4_ws, unnest([1, 2, 3, 4]) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |b4_pg AS (SELECT pair_id, n, g,
       |  CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |  CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM b4_g GROUP BY 1, 2, 3),
       |b4_pn AS (SELECT pair_id, n,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS BIGINT) AS clipped,
       |  CAST(SUM(c_cnt) AS BIGINT) AS c_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total
       |  FROM b4_pg GROUP BY 1, 2),
       |b4_lsrc AS (SELECT pair_id, n,
       |  CASE WHEN n = 1 THEN clipped ELSE clipped + 1 END AS cs,
       |  CASE WHEN n = 1 THEN c_total ELSE c_total + 1 END AS ts
       |  FROM b4_pn WHERE c_total >= 1
       |    AND (CASE WHEN n = 1 THEN clipped ELSE clipped + 1 END) >= 1)$logCtes,
       |b4_agg AS (SELECT p.pair_id,
       |  SUM(CASE WHEN p.c_total >= 1 THEN 1 ELSE 0 END) AS n_c_orders,
       |  MAX(CASE WHEN p.n = 1 THEN p.c_total END) AS c_len,
       |  MAX(CASE WHEN p.n = 1 THEN p.r_total END) AS r_len,
       |  MAX(CASE WHEN p.n = 1 THEN p.clipped END) AS clipped_1,
       |  MAX(CASE WHEN p.n = 2 THEN p.clipped END) AS clipped_2,
       |  MAX(CASE WHEN p.n = 3 THEN p.clipped END) AS clipped_3,
       |  MAX(CASE WHEN p.n = 4 THEN p.clipped END) AS clipped_4,
       |  CAST(SUM(l.ql) AS BIGINT) AS sum_qln,
       |  COUNT(l.ql) AS n_qln
       |  FROM b4_pn p LEFT JOIN $logLast l
       |    ON l.pair_id = p.pair_id AND l.n = p.n
       |  GROUP BY 1
       |  HAVING SUM(CASE WHEN p.c_total >= 1 THEN 1 ELSE 0 END) = 4
       |     AND MAX(CASE WHEN p.n = 1 THEN p.r_total END) >= 1)
       |SELECT pair_id, c_len, r_len,
       |  clipped_1, clipped_2, clipped_3, clipped_4,
       |  CAST($bp AS BIGINT) AS bp_log2fp,
       |  CASE WHEN clipped_1 >= 1 AND n_qln = 4
       |       THEN CAST(sum_qln + 4 * ($bp) AS BIGINT)
       |  END AS bleu_log2fp_x4
       |FROM b4_agg""".stripMargin
  }

  /** Pair-coverage audit — the r13 ADVICE item 3 surface: each eval
    * metric DROPS pairs its contract can't score (bleu4: candidate
    * < 4 words or reference absent; chrF: either side < maxN chars;
    * chrF++: additionally either side < 2 words; ROUGE-L: one-sided
    * only), and a downstream corpus aggregate that never sees those
    * rows can silently misrepresent short-text corpora. This gate
    * makes the drop ledger first-class: one row per metric with
    * (pairs_total, pairs_scored, pairs_dropped, pairs_truncated),
    * computed from the drop PREDICATES on one scan's per-slot side
    * lengths — so `pairs_scored` equals each gate's row count by
    * construction (spec-pinned against the actual gates; the corpus
    * and paired-bs faces pin their own n_pairs/n_quads columns). Every
    * face of the family is covered: positional (even, odd) gates,
    * multiref (mod-4 cand × 3 refs) gates whose denominator is QUADS,
    * and the paired-bs triple. `pairs_truncated` counts scored pairs
    * whose score may differ from the uncapped metric because a side
    * exceeded the DP gates' leading-`cap` window (r14 verdict item 3;
    * a truncated multiref candidate is one with ANY truncated scored
    * reference pair); gram metrics never truncate and report 0. A
    * NULL-text row behaves as an ABSENT side here because that is
    * what every gate does with it (split/length of NULL propagates
    * into each gate's filters). */
  def pairCoverage(docs: DataFrame, maxN: Int = 6,
      cap: Int = 40): DataFrame = {
    import org.apache.spark.sql.Column
    // one scan, grouped by QUAD (doc_id mod 4) — the quad subsumes the
    // (even, odd) pairs as sub-pairs (0,1)/(2,3), the multiref pairing
    // as (cand 0; refs 1..3), and the paired-bs triple (0, 1, 2), so
    // every metric's denominator comes off the same frame. Slot stats:
    // words, space-stripped chars, raw codepoints (the CER alphabet).
    val slotAggs = (0 to 3).flatMap { k => Seq(
      first(when(col("slot") === k, col("n_words")), ignoreNulls = true)
        .as(s"w$k"),
      first(when(col("slot") === k, col("n_chars")), ignoreNulls = true)
        .as(s"c$k"),
      first(when(col("slot") === k, col("n_raw")), ignoreNulls = true)
        .as(s"r$k")) }
    val perQuad = docs
      .filter(col("text").isNotNull)
      .select(
        (col("doc_id") - pmod(col("doc_id"), lit(4))).as("quad_id"),
        pmod(col("doc_id"), lit(4)).as("slot"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"),
        length(col("text")).cast("long").as("n_raw"))
      .groupBy(col("quad_id"))
      .agg(slotAggs.head, slotAggs.tail: _*)
    def w(k: Int) = col(s"w$k"); def c(k: Int) = col(s"c$k")
    def r(k: Int) = col(s"r$k")
    def p(k: Int) = w(k).isNotNull
    // per-quad counters. Mod-2 metrics sum their two sub-pairs (a, b);
    // a NULL comparison means an absent side and when() reads it as
    // false, which is exactly the absent-side drop.
    def sub(f: (Int, Int) => Column): Column =
      when(f(0, 1), 1L).otherwise(0L) + when(f(2, 3), 1L).otherwise(0L)
    def both(a: Int, b: Int) = p(a) && p(b)
    val anyRef = p(1) || p(2) || p(3)
    def none: Column = lit(0L)
    // (metric, pair-faced?, scored counter, truncated counter).
    // pairs_total is the metric's own denominator: (even, odd) pairs
    // with >= 1 side present for the positional gates, quads with
    // >= 1 row present for the multiref / paired-bs gates.
    // pairs_truncated counts SCORED pairs whose score may differ from
    // the uncapped metric (either side past the cap-`cap` window of
    // the DP gates; a multiref candidate counts when ANY scored
    // reference pair is truncated). Gram metrics never truncate -> 0.
    val metrics: Seq[(String, Boolean, Column, Column)] = Seq(
      ("eval_ngram_overlap", true,
        sub((a, b) => both(a, b) && w(a) >= 2 && w(b) >= 2), none),
      ("eval_bleu4", true, sub((a, b) => both(a, b) && w(a) >= 4), none),
      // corpus faces have one output row; "scored" = the pairs whose
      // counts enter the corpus sums
      ("eval_bleu4_corpus", true, sub(both), none),
      ("eval_bleu4_multiref", false,
        when(w(0) >= 4 && anyRef, 1L).otherwise(0L), none),
      ("eval_bleu4_paired_bs", false,
        when(p(0) && p(1) && p(2), 1L).otherwise(0L), none),
      ("eval_cer", true, sub((a, b) => r(a) >= 1 && r(b) >= 1),
        sub((a, b) => r(a) >= 1 && r(b) >= 1 && (r(a) > cap || r(b) > cap))),
      ("eval_cer_corpus", true, sub((a, b) => r(a) >= 1 && r(b) >= 1),
        sub((a, b) => r(a) >= 1 && r(b) >= 1 && (r(a) > cap || r(b) > cap))),
      ("eval_chrf", true,
        sub((a, b) => both(a, b) && c(a) >= maxN && c(b) >= maxN), none),
      ("eval_chrf_multiref", false,
        when(c(0) >= maxN && (c(1) >= maxN || c(2) >= maxN || c(3) >= maxN),
          1L).otherwise(0L), none),
      ("eval_chrf_paired_bs", false,
        when(c(0) >= 1 && c(1) >= 1 && c(2) >= 1, 1L).otherwise(0L), none),
      ("eval_chrf_reduced", true,
        sub((a, b) => both(a, b) && c(a) >= 1 && c(b) >= 1), none),
      ("eval_chrfpp", true,
        sub((a, b) => both(a, b) && c(a) >= maxN && c(b) >= maxN
          && w(a) >= 2 && w(b) >= 2), none),
      ("eval_chrfpp_corpus", true,
        sub((a, b) => both(a, b) && c(a) >= 1 && c(b) >= 1), none),
      ("eval_chrfpp_multiref", false, {
        def ok(k: Int) = c(k) >= maxN && w(k) >= 2
        when(ok(0) && (ok(1) || ok(2) || ok(3)), 1L).otherwise(0L) }, none),
      ("eval_rouge_l", true, sub(both),
        sub((a, b) => both(a, b) && (w(a) > cap || w(b) > cap))),
      ("eval_rouge_n", true, sub(both), none),
      ("eval_rouge_n_multiref", false,
        when(p(0) && anyRef, 1L).otherwise(0L), none),
      // corpus faces: "scored" = the pairs whose counts enter the sums
      ("eval_chrf_corpus", true,
        sub((a, b) => both(a, b) && c(a) >= 1 && c(b) >= 1), none),
      ("eval_wer_corpus", true, sub(both),
        sub((a, b) => both(a, b) && (w(a) > cap || w(b) > cap))),
      ("eval_rouge_l_multiref", false,
        when(p(0) && anyRef, 1L).otherwise(0L),
        when(p(0) && anyRef &&
          (w(0) > cap || w(1) > cap || w(2) > cap || w(3) > cap), 1L)
          .otherwise(0L)),
      ("eval_token_f1", true, sub(both), none),
      ("eval_token_f1_multiref", false,
        when(p(0) && anyRef, 1L).otherwise(0L), none),
      ("eval_wer", true, sub(both),
        sub((a, b) => both(a, b) && (w(a) > cap || w(b) > cap))),
      ("eval_wer_multiref", false,
        when(p(0) && anyRef, 1L).otherwise(0L),
        when(p(0) && anyRef &&
          (w(0) > cap || w(1) > cap || w(2) > cap || w(3) > cap), 1L)
          .otherwise(0L)))
    val totals = Seq(
      sum(when(p(0) || p(1), 1L).otherwise(0L)
        + when(p(2) || p(3), 1L).otherwise(0L)).as("pt_pairs"),
      // count, not sum(lit(1)): COUNT is 0 over an empty/all-NULL-text
      // frame like the mirror's COUNT(*), sum would be NULL
      count(lit(1)).as("pt_quads"))
    val counters = metrics.flatMap { case (m, _, sc, tr) =>
      Seq(sum(sc).as(s"sc_$m"), sum(tr).as(s"tr_$m")) }
    val aggs = totals ++ counters
    val wide = perQuad.agg(aggs.head, aggs.tail: _*)
    val stack = metrics.map { case (m, pairFaced, _, _) =>
      val pt = if (pairFaced) "pt_pairs" else "pt_quads"
      s"'$m', $pt, sc_$m, tr_$m"
    }.mkString(", ")
    wide
      .select(expr(s"stack(${metrics.size}, $stack) " +
        "AS (metric, pairs_total, pairs_scored, pairs_truncated)"))
      .select(col("metric"), col("pairs_total"), col("pairs_scored"),
        (col("pairs_total") - col("pairs_scored")).as("pairs_dropped"),
        col("pairs_truncated"))
  }

  /** DuckDB mirror of [[pairCoverage]]. */
  def pairCoverageSql(maxN: Int = 6, cap: Int = 40,
      from: String = "documents"): String = {
    // the same quad frame; per-metric one-row selects unioned so the
    // generator stays a literal transcription of the Spark counters
    def sub(pred: (Int, Int) => String): String =
      s"SUM((CASE WHEN ${pred(0, 1)} THEN 1 ELSE 0 END) + " +
        s"(CASE WHEN ${pred(2, 3)} THEN 1 ELSE 0 END))"
    def one(pred: String): String =
      s"SUM(CASE WHEN $pred THEN 1 ELSE 0 END)"
    def w(k: Int) = s"w$k"; def c(k: Int) = s"c$k"; def r(k: Int) = s"r$k"
    def p(k: Int) = s"w$k IS NOT NULL"
    def both(a: Int, b: Int) = s"${p(a)} AND ${p(b)}"
    val anyRef = s"(${p(1)} OR ${p(2)} OR ${p(3)})"
    def mrTrunc(base: String): String =
      s"$base AND (w0 > $cap OR w1 > $cap OR w2 > $cap OR w3 > $cap)"
    val none = "NULL IS NOT NULL" // constant false
    val metrics: Seq[(String, Boolean, String, String)] = Seq(
      ("eval_ngram_overlap", true,
        sub((a, b) => s"${both(a, b)} AND ${w(a)} >= 2 AND ${w(b)} >= 2"),
        sub((_, _) => none)),
      ("eval_bleu4", true,
        sub((a, b) => s"${both(a, b)} AND ${w(a)} >= 4"),
        sub((_, _) => none)),
      ("eval_bleu4_corpus", true, sub(both), sub((_, _) => none)),
      ("eval_bleu4_multiref", false, one(s"w0 >= 4 AND $anyRef"), one(none)),
      ("eval_bleu4_paired_bs", false,
        one(s"${p(0)} AND ${p(1)} AND ${p(2)}"), one(none)),
      ("eval_cer", true,
        sub((a, b) => s"${r(a)} >= 1 AND ${r(b)} >= 1"),
        sub((a, b) => s"${r(a)} >= 1 AND ${r(b)} >= 1 AND " +
          s"(${r(a)} > $cap OR ${r(b)} > $cap)")),
      ("eval_cer_corpus", true,
        sub((a, b) => s"${r(a)} >= 1 AND ${r(b)} >= 1"),
        sub((a, b) => s"${r(a)} >= 1 AND ${r(b)} >= 1 AND " +
          s"(${r(a)} > $cap OR ${r(b)} > $cap)")),
      ("eval_chrf", true,
        sub((a, b) => s"${both(a, b)} AND ${c(a)} >= $maxN AND ${c(b)} >= $maxN"),
        sub((_, _) => none)),
      ("eval_chrf_multiref", false,
        one(s"c0 >= $maxN AND (c1 >= $maxN OR c2 >= $maxN OR c3 >= $maxN)"),
        one(none)),
      ("eval_chrf_paired_bs", false,
        one("c0 >= 1 AND c1 >= 1 AND c2 >= 1"), one(none)),
      ("eval_chrf_reduced", true,
        sub((a, b) => s"${both(a, b)} AND ${c(a)} >= 1 AND ${c(b)} >= 1"),
        sub((_, _) => none)),
      ("eval_chrfpp", true,
        sub((a, b) => s"${both(a, b)} AND ${c(a)} >= $maxN AND " +
          s"${c(b)} >= $maxN AND ${w(a)} >= 2 AND ${w(b)} >= 2"),
        sub((_, _) => none)),
      ("eval_chrfpp_corpus", true,
        sub((a, b) => s"${both(a, b)} AND ${c(a)} >= 1 AND ${c(b)} >= 1"),
        sub((_, _) => none)),
      ("eval_chrfpp_multiref", false, {
        def ok(k: Int) = s"(c$k >= $maxN AND w$k >= 2)"
        one(s"${ok(0)} AND (${ok(1)} OR ${ok(2)} OR ${ok(3)})") },
        one(none)),
      ("eval_rouge_l", true, sub(both),
        sub((a, b) => s"${both(a, b)} AND (${w(a)} > $cap OR ${w(b)} > $cap)")),
      ("eval_rouge_n", true, sub(both), sub((_, _) => none)),
      ("eval_rouge_n_multiref", false, one(s"${p(0)} AND $anyRef"),
        one(none)),
      ("eval_chrf_corpus", true,
        sub((a, b) => s"${both(a, b)} AND ${c(a)} >= 1 AND ${c(b)} >= 1"),
        sub((_, _) => none)),
      ("eval_wer_corpus", true, sub(both),
        sub((a, b) => s"${both(a, b)} AND (${w(a)} > $cap OR ${w(b)} > $cap)")),
      ("eval_rouge_l_multiref", false, one(s"${p(0)} AND $anyRef"),
        one(mrTrunc(s"${p(0)} AND $anyRef"))),
      ("eval_token_f1", true, sub(both), sub((_, _) => none)),
      ("eval_token_f1_multiref", false, one(s"${p(0)} AND $anyRef"),
        one(none)),
      ("eval_wer", true, sub(both),
        sub((a, b) => s"${both(a, b)} AND (${w(a)} > $cap OR ${w(b)} > $cap)")),
      ("eval_wer_multiref", false, one(s"${p(0)} AND $anyRef"),
        one(mrTrunc(s"${p(0)} AND $anyRef"))))
    val slotCols = (0 to 3).flatMap { k => Seq(
      s"MAX(CASE WHEN slot = $k THEN n_words END) AS w$k",
      s"MAX(CASE WHEN slot = $k THEN n_chars END) AS c$k",
      s"MAX(CASE WHEN slot = $k THEN n_raw END) AS r$k") }.mkString(",\n    ")
    val counterCols = metrics.map { case (m, _, sc, tr) =>
      s"CAST($sc AS BIGINT) AS sc_$m,\n    CAST($tr AS BIGINT) AS tr_$m"
    }.mkString(",\n    ")
    val rows = metrics.map { case (m, pairFaced, _, _) =>
      val pt = if (pairFaced) "pt_pairs" else "pt_quads"
      s"SELECT '$m' AS metric, $pt AS pairs_total, sc_$m AS pairs_scored, " +
        s"$pt - sc_$m AS pairs_dropped, tr_$m AS pairs_truncated FROM pc_wide"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH pc_side AS (
       |  SELECT doc_id - (((doc_id % 4) + 4) % 4) AS quad_id,
       |         ((doc_id % 4) + 4) % 4 AS slot,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
       |         CAST(length(text) AS BIGINT) AS n_raw
       |  FROM $from WHERE text IS NOT NULL),
       |pc_quad AS (
       |  SELECT quad_id,
       |    $slotCols
       |  FROM pc_side GROUP BY 1),
       |pc_wide AS (
       |  SELECT
       |    CAST(SUM((CASE WHEN w0 IS NOT NULL OR w1 IS NOT NULL
       |              THEN 1 ELSE 0 END) +
       |             (CASE WHEN w2 IS NOT NULL OR w3 IS NOT NULL
       |              THEN 1 ELSE 0 END)) AS BIGINT) AS pt_pairs,
       |    CAST(COUNT(*) AS BIGINT) AS pt_quads,
       |    $counterCols
       |  FROM pc_quad)
       |  $rows""".stripMargin
  }

  /** DuckDB mirror of [[bleu4MultiRef]]. `candsFrom` must select
    * (cand_id, text); `refsFrom` (cand_id, ref_id, text). */
  def bleu4MultiRefSql(fbits: Int = 20,
      candsFrom: String, refsFrom: String): String = {
    val (logCtes, logLast) = DuckHash.log2fpRowCtes(
      "bm_lsrc", Seq("cand_id", "n"), "cs", "ts", "bmlg", fbits)
    val bp = s"CASE WHEN a.c_len >= e.r_len THEN 0 ELSE " +
      s"-CAST(((e.r_len - a.c_len)::HUGEINT * ${1L << fbits} * 1000000) // " +
      s"(a.c_len::HUGEINT * $Ln2E6) AS BIGINT) END"
    s"""WITH bm_cg AS (
       |  SELECT cand_id, -1 AS ref_id, 0 AS side, tn.n AS n,
       |         md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM (SELECT cand_id, string_split(text, ' ') AS ws
       |        FROM $candsFrom) c,
       |       unnest([1, 2, 3, 4]) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |bm_rg AS (
       |  SELECT cand_id, ref_id, 1 AS side, tn.n AS n,
       |         md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM (SELECT cand_id, ref_id, string_split(text, ' ') AS ws
       |        FROM $refsFrom) r,
       |       unnest([1, 2, 3, 4]) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |bm_cnt AS (SELECT cand_id, n, g, side, ref_id,
       |  CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT * FROM bm_cg UNION ALL SELECT * FROM bm_rg)
       |  GROUP BY 1, 2, 3, 4, 5),
       |bm_pg AS (SELECT cand_id, n, g,
       |  MAX(CASE WHEN side = 0 THEN cnt END) AS c_cnt,
       |  MAX(CASE WHEN side = 1 THEN cnt END) AS r_maxcnt
       |  FROM bm_cnt GROUP BY 1, 2, 3),
       |bm_pn AS (SELECT cand_id, n,
       |  CAST(SUM(CASE WHEN c_cnt IS NOT NULL AND r_maxcnt IS NOT NULL
       |           THEN LEAST(c_cnt, r_maxcnt) ELSE 0 END) AS BIGINT) AS clipped,
       |  CAST(SUM(COALESCE(c_cnt, 0)) AS BIGINT) AS c_total
       |  FROM bm_pg GROUP BY 1, 2
       |  HAVING SUM(COALESCE(c_cnt, 0)) >= 1),
       |bm_lsrc AS (SELECT cand_id, n,
       |  CASE WHEN n = 1 THEN clipped ELSE clipped + 1 END AS cs,
       |  CASE WHEN n = 1 THEN c_total ELSE c_total + 1 END AS ts
       |  FROM bm_pn
       |  WHERE (CASE WHEN n = 1 THEN clipped ELSE clipped + 1 END) >= 1)$logCtes,
       |bm_rlen AS (SELECT cand_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS r_len_i
       |  FROM $refsFrom WHERE text IS NOT NULL),
       |bm_clen AS (SELECT cand_id, c_total AS c_len FROM bm_pn WHERE n = 1),
       |bm_reff AS (SELECT r.cand_id, CAST(COUNT(*) AS BIGINT) AS n_refs,
       |  CAST(MIN(ABS(r.r_len_i - c.c_len)::HUGEINT * 1000000000 + r.r_len_i)
       |       % 1000000000 AS BIGINT) AS r_len
       |  FROM bm_rlen r JOIN bm_clen c ON c.cand_id = r.cand_id GROUP BY 1),
       |bm_agg AS (SELECT p.cand_id,
       |  COUNT(*) AS n_c_orders,
       |  MAX(CASE WHEN p.n = 1 THEN p.c_total END) AS c_len,
       |  MAX(CASE WHEN p.n = 1 THEN p.clipped END) AS clipped_1,
       |  MAX(CASE WHEN p.n = 2 THEN p.clipped END) AS clipped_2,
       |  MAX(CASE WHEN p.n = 3 THEN p.clipped END) AS clipped_3,
       |  MAX(CASE WHEN p.n = 4 THEN p.clipped END) AS clipped_4,
       |  CAST(SUM(l.ql) AS BIGINT) AS sum_qln,
       |  COUNT(l.ql) AS n_qln
       |  FROM bm_pn p LEFT JOIN $logLast l
       |    ON l.cand_id = p.cand_id AND l.n = p.n
       |  GROUP BY 1
       |  HAVING COUNT(*) = 4)
       |SELECT a.cand_id, e.n_refs, a.c_len, e.r_len,
       |  a.clipped_1, a.clipped_2, a.clipped_3, a.clipped_4,
       |  CAST($bp AS BIGINT) AS bp_log2fp,
       |  CASE WHEN a.clipped_1 >= 1 AND a.n_qln = 4
       |       THEN CAST(a.sum_qln + 4 * ($bp) AS BIGINT)
       |  END AS bleu_log2fp_x4
       |FROM bm_agg a JOIN bm_reff e ON e.cand_id = a.cand_id""".stripMargin
  }

  /** DuckDB mirror of [[clippedOverlap]]. */
  def clippedOverlapSql(n: Int = 2, from: String = "documents"): String =
    s"""WITH nev_ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $from),
       |nev_grams AS (
       |  SELECT doc_id - (((doc_id % 2) + 2) % 2) AS pair_id,
       |         ((doc_id % 2) + 2) % 2 AS side,
       |         md5(array_to_string(ws[i:i+${n - 1}], ' ')) AS g
       |  FROM nev_ws, unnest(generate_series(1, len(ws) - ${n - 1})) t(i)
       |  WHERE len(ws) >= $n),
       |nev_pg AS (
       |  SELECT pair_id, g,
       |    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM nev_grams GROUP BY 1, 2)
       |SELECT pair_id,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS BIGINT) AS clipped,
       |  CAST(SUM(c_cnt) AS BIGINT) AS c_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS DOUBLE) / SUM(c_cnt) AS precision_n,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS DOUBLE) / SUM(r_cnt) AS recall_n
       |FROM nev_pg GROUP BY 1
       |HAVING SUM(c_cnt) > 0 AND SUM(r_cnt) > 0""".stripMargin
}
