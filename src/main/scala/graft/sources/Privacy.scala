package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy auditing for training-data releases: k-anonymity and
  * l-diversity over quasi-identifier columns (Sweeney 2002; Machanavajjhala
  * et al. 2007). A row is re-identifiable when its quasi-identifier
  * equivalence class is small (< k members), and a k-anonymous class
  * still leaks its sensitive attribute when every member shares one
  * value (homogeneity) — both are per-class aggregates, so the audit is
  * one hash-aggregate over the quasi key.
  *
  * Scale shape: the audit output is bounded by quasi-identifier
  * cardinality (a dimension-sized frame, NOT row count), so enforcement
  * joins the class verdicts BACK via broadcast instead of running a
  * corpus-wide window — aggregate-then-broadcast is one shuffle plus a
  * map-side join at any corpus size.
  *
  * The reference has no privacy surface; this extends the
  * training-data quality family (PII scrub, drift, profile).
  */
object Privacy {

  /** Per-equivalence-class audit: class size `n`, distinct sensitive
    * values `l_diversity`, and the two standard verdicts. */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[String], sensitive: String,
      k: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("l_diversity"))
      .withColumn("suppress", col("n") < k)
      .withColumn("homogeneous", col("l_diversity") === 1)

  /** Enforcement face: keep only rows whose class satisfies k-anonymity
    * (and, if `minL` > 1, l-diversity). Class verdicts are a bounded
    * frame → broadcast back onto the corpus. */
  def suppressSmallClasses(df: DataFrame, quasi: Seq[String],
      sensitive: String, k: Int, minL: Int = 1): DataFrame = {
    val ok = kAnonymityAudit(df, quasi, sensitive, k)
      .where(!col("suppress") && col("l_diversity") >= minL)
      .select(quasi.map(col): _*)
    df.join(broadcast(ok), quasi, "left_semi")
  }

  /** DuckDB oracle for [[kAnonymityAudit]]. */
  def kAnonymityAuditSql(from: String, quasi: Seq[String], sensitive: String,
      k: Int): String = {
    val q = quasi.mkString(", ")
    s"""SELECT $q, COUNT(*) AS n,
       |       COUNT(DISTINCT $sensitive) AS l_diversity,
       |       COUNT(*) < $k AS suppress,
       |       COUNT(DISTINCT $sensitive) = 1 AS homogeneous
       |FROM $from GROUP BY $q""".stripMargin
  }
}
