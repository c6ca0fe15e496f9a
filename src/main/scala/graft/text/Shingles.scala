package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word n-gram shingling + exact Jaccard, the shared substrate for the
  * dedup operators. All-pairs similarity is computed by JOINING ON THE
  * SHINGLE (inverted-index pattern), never by cross-join — at 100 TB the
  * shingle join scales with Σ f(shingle)², which stays bounded when
  * high-document-frequency shingles are capped (maxShingleDF).
  */
object Shingles {

  /** THE one shingling pass: per doc, the distinct word n-gram shingles
    * as an array of 64-bit xxhash64 values (the join/shuffle currency at
    * scale — 8 bytes instead of ~20-char strings; collision probability
    * ~n²/2^64, irrelevant below ~10^8 distinct shingles). Everything
    * downstream (exploded shingle table, per-doc set sizes, minhash
    * signatures) derives from this one narrow scan — cache it when a
    * pipeline uses more than one derivation. */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"), expr(
        s"transform(array_distinct(transform(sequence(0, size(words)-$n), i -> " +
          (0 until n).map(j => s"words[i+$j]").mkString("concat_ws(' ', ", ", ", ")") +
          ")), s -> xxhash64(s))"
      ).as("shingles"))

  /** The word-n-gram window expr (WITH multiplicity, 1-based) shared
    * by the contamination/eval family: callers must guard
    * `size(<ws>) >= n`. One definition so a window/separator fix
    * cannot de-synchronize the sites (several pre-r13 text/ sites
    * still inline the same idiom; new code should use this). */
  def wordNgramsExpr(wsCol: String, n: Int): String =
    s"transform(sequence(1, size($wsCol) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice($wsCol, i, $n)))"

  /** Distinct word 3-gram shingles per doc: (doc_id, shingle string).
    * Kept for oracle-parity inspection; the pipelines use hashes. */
  def shingleTable(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(0, size(words)-$n), i -> " +
          (0 until n).map(j => s"words[i+$j]").mkString("concat_ws(' ', ", ", ", ")") + ")"
      ))).as("shingle"))

  /** Exploded (doc_id, shingle hash) rows — [[shingleSets]] unnested. */
  def shingleHashTable(docs: DataFrame, n: Int = 3): DataFrame =
    shingleSets(docs, n).select(col("doc_id"), explode(col("shingles")).as("shingle"))

  /** Exact pairwise Jaccard over shingle sets for all pairs sharing at
    * least one shingle, via inverted-index self-join. Shingles with
    * document frequency above maxShingleDF are dropped (stop-shingle
    * cap, standard at scale: one high-DF shingle makes the candidate
    * join Σf² quadratic). With the cap on, `common` counts only rare
    * shingles while sizes stay exact — so reported jaccard is a lower
    * bound that converges to exact as the cap rises; with cap 0 the
    * result is exact Jaccard. */
  def exactJaccardPairs(docs: DataFrame, threshold: Double,
      maxShingleDF: Long = 0L): DataFrame =
    sizedCommonPairs(docs, maxShingleDF)
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("size_a"),
        col("size_b"), col("jaccard"))

  /** Shared candidate join for the exact Jaccard/containment faces
    * (r15 optimization): the per-doc set size rides each exploded
    * shingle row (+8 bytes) into the pair aggregation, so the pair
    * table never joins back to a sizes frame — the old spelling's
    * second eager localCheckpoint and two pair-table joins are gone
    * (2 fewer pair-table shuffles at scale; sizes are constant within
    * a (doc_a, doc_b) group, max() reads them back). With the DF cap,
    * sizes stay EXACT (computed before the cap filter). The shingle
    * pass stays cached exactly once and the bounded pair table is
    * pinned eagerly before the cache drops (the scan-ratchet
    * contract: one documents scan per gate — letting each join side
    * recompute the shingling was measured as 2–4 extra corpus scans
    * per gate, 10 on pipeline_negative_sampling). */
  private def sizedCommonPairs(docs: DataFrame,
      maxShingleDF: Long): DataFrame = {
    val sets = shingleSets(docs).cache()
    val sh = sets.select(col("doc_id"),
      size(col("shingles")).cast("long").as("sz"),
      explode(col("shingles")).as("shingle"))
    val candidates0 =
      if (maxShingleDF > 0) {
        val rare = sh.groupBy("shingle").count()
          .filter(col("count") <= maxShingleDF).select("shingle")
        sh.join(broadcast(rare), Seq("shingle"))
      } else sh
    val a = candidates0.select(col("shingle"), col("doc_id").as("doc_a"),
      col("sz").as("sza"))
    val b = candidates0.select(col("shingle"), col("doc_id").as("doc_b"),
      col("sz").as("szb"))
    val common = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"), max(col("sza")).as("size_a"),
        max(col("szb")).as("size_b"))
      .localCheckpoint(true)
    sets.unpersist(false)
    common
  }

  /** Exact Jaccard pairs via PREFIX FILTERING (SSJoin/PPJoin family,
    * Chaudhuri et al.) — the recall-LOSSLESS candidate reduction for
    * high thresholds, vs the plain inverted-index join above whose
    * candidate set is every pair sharing ANY shingle:
    *
    * Order all shingles by global rarity (df asc, hash asc — a total
    * order). For a pair with J(A,B) ≥ t, the overlap is an integer
    * ≥ ⌈t·|A|⌉, so B must hit one of A's first |A| − ⌈t·|A|⌉ + 1
    * shingles in that order (pigeonhole) — and symmetrically for B.
    * Joining PREFIX×PREFIX therefore loses no qualifying pair, while
    * candidate cost drops from Σ df(g)² over all shingles to Σ over
    * prefix occurrences only — and prefixes are the RAREST shingles,
    * exactly the ones with tiny df. Verification is the same exact
    * common-count join as [[exactJaccardPairs]], restricted to
    * candidates. Output schema and values are identical to the
    * uncapped exact join at the same threshold (the gate shares its
    * oracle SQL).
    *
    * At 100 TB: two extra narrow shuffles (df join + per-doc rank
    * window) buy a candidate join that no longer blows up on common
    * shingles, WITHOUT the DF-cap's lower-bound compromise — this is
    * the exactness-preserving scale path where `cappedJaccardPairs`
    * trades exactness for cost. */
  def prefixJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    val sets = shingleSets(docs).cache()
    val sh = sets.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("sz") - ceil(lit(threshold) * col("sz")) + lit(1))
      .select(col("doc_id"), col("shingle"), col("sz"), col("rn"))
      // both sides of the candidate self-join read this frame, and the
      // rename-heavy selects defeat ReuseExchange canonicalization (the
      // rec_item_similarity lesson) — without this the df-join + two
      // windows execute twice. Prefix rows ≤ (1−t)·|shingles| per doc,
      // the same bounded-materialization call j_record_linkage makes.
      .localCheckpoint(true)
    // two more LOSSLESS prunes before the distinct + verify join:
    //  - length filter: J ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|);
    //  - PPJoin positional filter: a collision at prefix ranks
    //    (i, j) bounds the overlap by 1 + min(|A|−i, |B|−j); J ≥ t
    //    needs overlap ≥ ⌈t/(1+t)·(|A|+|B|)⌉, and a qualifying pair's
    //    FIRST shared shingle always passes (all other shared
    //    shingles rank after it on both sides), so pruning the later
    //    collisions loses no pair. The 1e-9 slack keeps the ceil on
    //    the safe side of float wobble (under-pruning, never over).
    val alpha = ceil(lit(threshold / (1.0 + threshold)) *
      (col("_sza") + col("_szb")) - lit(1e-9))
    // candidate pairs CARRY the exact sizes (sz is the per-doc total
    // computed above, before the prefix cut) so the verify tail needs
    // no sizes frame — the r15 carried-size restructure, see
    // sizedCommonPairs
    val cands = prefix.select(col("doc_id").as("doc_a"),
        col("shingle"), col("sz").as("_sza"), col("rn").as("_rna"))
      .join(prefix.select(col("doc_id").as("doc_b"),
        col("shingle"), col("sz").as("_szb"), col("rn").as("_rnb")), "shingle")
      .filter(col("doc_a") < col("doc_b") &&
        least(col("_sza"), col("_szb")).cast("double") >=
          lit(threshold) * greatest(col("_sza"), col("_szb")).cast("double") &&
        lit(1) + least(col("_sza") - col("_rna"), col("_szb") - col("_rnb"))
          >= alpha)
      .select(col("doc_a"), col("doc_b"), col("_sza"), col("_szb"))
      .distinct()
    // exact verify on candidates only — same tail as exactJaccardPairs
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val common = cands
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"), max(col("_sza")).as("size_a"),
        max(col("_szb")).as("size_b"))
      .localCheckpoint(true)
    sets.unpersist(false)
    common
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("size_a"),
        col("size_b"), col("jaccard"))
  }

  /** Exact pairwise CONTAINMENT — |A∩B| / min(|A|,|B|) — over shingle
    * sets, same inverted-index join shape as [[exactJaccardPairs]].
    * Containment is the doc-in-doc measure Jaccard misses when sizes
    * are skewed: a short doc fully quoted inside a much larger one has
    * jaccard ≈ |A|/|B| (tiny) but containment ≈ 1. Standard in
    * training-data dedup for catching boilerplate wrappers and
    * quote-expansion duplicates. The DF cap bounds the candidate join
    * exactly as in the Jaccard path (common becomes a lower bound,
    * sizes stay exact). */
  def exactContainmentPairs(docs: DataFrame, threshold: Double,
      maxShingleDF: Long = 0L): DataFrame =
    sizedCommonPairs(docs, maxShingleDF)
      .withColumn("containment",
        col("common").cast("double") /
          least(col("size_a"), col("size_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("size_a"),
        col("size_b"), col("containment"))

  private def shingleCte: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id,
      |    words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT)+1] || ' ' || words[CAST(i AS INT)+2] AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t,
      |  LATERAL (SELECT unnest(generate_series(1, len(words)-2)) AS i) s
      |  WHERE len(words) >= 3),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1)""".stripMargin

  /** DuckDB mirror of [[exactJaccardPairs]] (no DF cap), word 3-grams. */
  def exactJaccardSql(threshold: Double): String =
    s"""$shingleCte,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, common, sa.sz AS size_a, sb.sz AS size_b,
       |  CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= $threshold""".stripMargin

  /** DuckDB mirror of [[exactJaccardPairs]] WITH the DF cap: common
    * counts come from the rare-shingle table, sizes stay exact. */
  def cappedJaccardSql(threshold: Double, maxShingleDF: Long): String =
    s"""$shingleCte,
       |rare AS (SELECT shingle FROM sh GROUP BY shingle
       |         HAVING COUNT(*) <= $maxShingleDF),
       |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, common, sa.sz AS size_a, sb.sz AS size_b,
       |  CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= $threshold""".stripMargin

  /** DuckDB mirror of [[exactContainmentPairs]]; maxShingleDF = 0 means
    * no cap (candidate pairs come from ALL shingles). */
  def containmentSql(threshold: Double, maxShingleDF: Long = 0L): String = {
    val (capCtes, pairSrc) =
      if (maxShingleDF > 0)
        (s""",
            |rare AS (SELECT shingle FROM sh GROUP BY shingle
            |         HAVING COUNT(*) <= $maxShingleDF),
            |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle))""".stripMargin,
          "shr")
      else ("", "sh")
    s"""$shingleCte$capCtes,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM $pairSrc a JOIN $pairSrc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, common, sa.sz AS size_a, sb.sz AS size_b,
       |  CAST(common AS DOUBLE) / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE) AS containment
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE) >= $threshold""".stripMargin
  }
}
