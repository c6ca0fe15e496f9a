package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** χ² feature selection — rank each label's most discriminative tokens
  * by the chi-squared statistic of the token×label document-incidence
  * 2×2 contingency table. The feature-pruning step before training a
  * text classifier (and the "what words define this language/domain"
  * diagnostic) over the documents table.
  *
  * Scale shape: ONE corpus scan explodes distinct tokens per doc; all
  * remaining math runs on vocab-sized frames — (token, label) counts
  * join token DF totals (both vocab-cardinality) and a broadcast
  * label-counts table; the per-label top-k window partitions by label.
  * The corpus is never shuffled twice and never joined to itself.
  *
  * Exactness: a, b, c, d are exact longs; χ² = N(ad−bc)²/((a+b)(c+d)
  * (a+c)(b+d)) is evaluated in double (products can pass 2⁶³ at corpus
  * scale) — identical IEEE op sequence on exact-integer inputs in both
  * engines — then rounded to 6 dp so the rank ordering compares the
  * same grid; ties break on the token string.
  */
object FeatureSelect {

  /** @param minDf drop tokens in fewer than `minDf` docs (noise guard
    *              AND the vocab-size bound at corpus scale)
    * @return (label, token, df_label, df_token, chi2, rank) — top-`k`
    *         tokens per label by (chi2 desc, token asc). */
  def chi2Terms(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, k: Int, minDf: Long): DataFrame = {
    val toks = docs.select(col(labelCol).as("_lab"),
        col(idCol).as("_id"),
        explode(array_distinct(split(col(textCol), " "))).as("_tok"))
      .filter(col("_tok") =!= "")
    // vocab×label bounded, referenced by the df rollup AND the scoring
    // join — pinned so the corpus explode runs once; the corpus total
    // folds off the label counts instead of a third source pass
    // (scan census: 4 → 2 corpus scans)
    val tokLabel = toks.groupBy(col("_tok"), col("_lab"))
      .agg(count(lit(1)).as("_a"))
      .localCheckpoint(true)
    val tokDf = tokLabel.groupBy(col("_tok"))
      .agg(sum(col("_a")).as("_dft"))
      .filter(col("_dft") >= minDf)
    val labelN = docs.groupBy(col(labelCol).as("_lab"))
      .agg(count(lit(1)).as("_nl"))
      .localCheckpoint(true)
    val totalN = labelN.agg(sum(col("_nl")).as("_n"))
    val a = col("_a").cast("double")
    val b = (col("_dft") - col("_a")).cast("double")
    val c = (col("_nl") - col("_a")).cast("double")
    val d = (col("_n") - col("_nl") - col("_dft") + col("_a")).cast("double")
    val n = col("_n").cast("double")
    val denom = (a + b) * (c + d) * (a + c) * (b + d)
    val scored = tokLabel
      .join(tokDf, Seq("_tok"))
      .join(broadcast(labelN), Seq("_lab"))
      .crossJoin(broadcast(totalN)) // 1-row corpus count
      .withColumn("chi2",
        round(when(denom > 0.0,
          n * (a * d - b * c) * (a * d - b * c) / denom)
          .otherwise(0.0), 6))
    val w = Window.partitionBy(col("_lab"))
      .orderBy(col("chi2").desc, col("_tok"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_lab").as("label"), col("_tok").as("token"),
        col("_a").as("df_label"), col("_dft").as("df_token"),
        col("chi2"), col("rank"))
  }

  /** DuckDB mirror of [[chi2Terms]]. */
  def chi2TermsSql(srcSql: String, idSql: String, textSql: String,
      labelSql: String, k: Int, minDf: Long): String =
    s"""WITH src AS ($srcSql),
       |toks AS (
       |  SELECT DISTINCT $labelSql AS lab, $idSql AS id, w.tok
       |  FROM src, unnest(string_split($textSql, ' ')) w(tok)
       |  WHERE w.tok <> ''),
       |tok_label AS (
       |  SELECT tok, lab, CAST(COUNT(*) AS BIGINT) AS a
       |  FROM toks GROUP BY 1, 2),
       |tok_df AS (
       |  SELECT tok, CAST(SUM(a) AS BIGINT) AS dft
       |  FROM tok_label GROUP BY 1 HAVING SUM(a) >= $minDf),
       |label_n AS (SELECT $labelSql AS lab, COUNT(*) AS nl
       |  FROM src GROUP BY 1),
       |total_n AS (SELECT COUNT(*) AS n_total FROM src),
       |scored AS (
       |  SELECT tl.lab, tl.tok, tl.a, td.dft,
       |    round(CASE WHEN
       |      (CAST(tl.a AS DOUBLE) + (td.dft - tl.a)) *
       |      ((ln.nl - tl.a) + (tn.n_total - ln.nl - td.dft + tl.a)) *
       |      (CAST(tl.a AS DOUBLE) + (ln.nl - tl.a)) *
       |      ((td.dft - tl.a) + (tn.n_total - ln.nl - td.dft + tl.a)) > 0
       |    THEN
       |      CAST(tn.n_total AS DOUBLE) *
       |      (CAST(tl.a AS DOUBLE) * (tn.n_total - ln.nl - td.dft + tl.a)
       |        - CAST(td.dft - tl.a AS DOUBLE) * (ln.nl - tl.a)) *
       |      (CAST(tl.a AS DOUBLE) * (tn.n_total - ln.nl - td.dft + tl.a)
       |        - CAST(td.dft - tl.a AS DOUBLE) * (ln.nl - tl.a)) /
       |      ((CAST(tl.a AS DOUBLE) + (td.dft - tl.a)) *
       |       ((ln.nl - tl.a) + (tn.n_total - ln.nl - td.dft + tl.a)) *
       |       (CAST(tl.a AS DOUBLE) + (ln.nl - tl.a)) *
       |       ((td.dft - tl.a) + (tn.n_total - ln.nl - td.dft + tl.a)))
       |    ELSE 0.0 END, 6) AS chi2
       |  FROM tok_label tl JOIN tok_df td USING (tok)
       |  JOIN label_n ln USING (lab), total_n tn)
       |SELECT lab AS label, tok AS token, a AS df_label, dft AS df_token,
       |  chi2, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY lab
       |    ORDER BY chi2 DESC, tok) AS INT) AS rank
       |  FROM scored) t
       |WHERE rank <= $k""".stripMargin
}
