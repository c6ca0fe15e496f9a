package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information word association mining over doc-level
  * co-occurrence: PMI(a,b) = ln(N·c(ab) / (c(a)·c(b))) where c counts
  * DOCUMENTS containing the token (pair). The classic collocation /
  * related-term signal (phrase detection, query expansion, embedding
  * evaluation) — positive PMI = the pair co-occurs more than their
  * popularity predicts.
  *
  * Scale shape: ONE token scan → per-doc distinct tokens; pair counts
  * come from a per-doc self-join of that narrow (doc, token) table —
  * cost Σ_doc t(doc)², the standard co-occurrence bound, and the
  * optional `maxTokenDF` cap drops stop-words BEFORE pairing (the
  * stop-shingle pattern: one ubiquitous token otherwise contributes
  * n_docs² candidate rows at corpus scale). Token doc-frequencies and
  * N ride the same scan; the PMI math runs on vocab² rows at most.
  *
  * Oracle exactness: counts are exact longs; each PMI is one
  * ln(double) rounded to 6 dp (the entropy/PSI precedent — the 6-dp
  * grid absorbs cross-engine ln ULP differences).
  */
object Pmi {

  /** Token-pair PMI table: (tok_a, tok_b, n_ab, n_a, n_b, pmi), pairs
    * ordered tok_a < tok_b, restricted to n_ab >= minPairCount. */
  def pairPmi(docs: DataFrame, minPairCount: Long = 5L,
      maxTokenDF: Long = 0L): DataFrame = {
    // the (doc, token) incidence list is read THREE ways (df counts +
    // both pair sides, whose renamed projections defeat ReuseExchange)
    // and the vocab-bounded df table twice — pinned so the corpus
    // explode runs once (scan-censused 5 → 2 source scans)
    val docTok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
      .localCheckpoint(true)
    val df = docTok.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
      .localCheckpoint(true)
    val kept =
      if (maxTokenDF > 0)
        docTok.join(broadcast(df.filter(col("n_tok") <= maxTokenDF)
          .select("tok")), Seq("tok"))
      else docTok
    val a = kept.select(col("doc_id"), col("tok").as("tok_a"))
    val b = kept.select(col("doc_id"), col("tok").as("tok_b"))
    val pairs = a.join(b, Seq("doc_id"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    pairs
      .join(broadcast(df.select(col("tok").as("tok_a"), col("n_tok").as("n_a"))),
        Seq("tok_a"))
      .join(broadcast(df.select(col("tok").as("tok_b"), col("n_tok").as("n_b"))),
        Seq("tok_b"))
      .crossJoin(broadcast(nDocs))
      .withColumn("pmi", round(log(
        col("n_docs").cast("double") * col("n_ab").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))), 6))
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("pmi"))
  }

  /** DuckDB mirror of [[pairPmi]] (no DF cap) over documents. */
  def pairPmiSql(minPairCount: Long = 5L): String =
    s"""WITH dt AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok FROM dt GROUP BY 1),
       |pairs AS (
       |  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(count(*) AS BIGINT) AS n_ab
       |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
       |  GROUP BY 1, 2 HAVING count(*) >= $minPairCount),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
       |SELECT tok_a, tok_b, n_ab, da.n_tok AS n_a, db.n_tok AS n_b,
       |  ROUND(ln(CAST(n_docs AS DOUBLE) * CAST(n_ab AS DOUBLE) /
       |    (CAST(da.n_tok AS DOUBLE) * CAST(db.n_tok AS DOUBLE))), 6) AS pmi
       |FROM pairs JOIN df da ON tok_a = da.tok
       |JOIN df db ON tok_b = db.tok CROSS JOIN n""".stripMargin
}
