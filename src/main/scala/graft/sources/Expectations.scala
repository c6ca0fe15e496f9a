package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation suite (the Deequ/Great-Expectations
  * pattern): a publish gate declares expectations over a table and gets
  * back one verdict row per rule — the check a training-data pipeline
  * runs BEFORE a snapshot is released to consumers.
  *
  * Scale shape: every rule compiles to an aggregate expression and the
  * whole suite folds in ONE pass over the table (a single
  * partial→final hash aggregate; `Unique` adds the standard
  * distinct-expand, still one job). The verdict frame is rules-sized.
  * No per-rule scans, no driver row handling.
  *
  * Exactness: observed metrics are ratios of exact longs (one IEEE
  * divide), so the gate hash-matches a DuckDB oracle built from the
  * same rule list.
  */
object Expectations {

  /** One declarative expectation; `minRatio` is the pass threshold on
    * the observed satisfaction ratio (1.0 = must always hold). */
  sealed trait Rule {
    def name: String
    def column: String
    def minRatio: Double
  }
  /** column is non-null. */
  case class NotNull(column: String, minRatio: Double = 1.0) extends Rule {
    val name = s"not_null($column)"
  }
  /** distinct(column) / rows — 1.0 means unique key. */
  case class Unique(column: String, minRatio: Double = 1.0) extends Rule {
    val name = s"unique($column)"
  }
  /** lo ≤ column ≤ hi (nulls fail). */
  case class InRange(column: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Rule {
    val name = s"in_range($column,$lo,$hi)"
  }
  /** column ∈ values (nulls fail). */
  case class InSet(column: String, values: Seq[String],
      minRatio: Double = 1.0) extends Rule {
    val name = s"in_set($column)"
  }
  /** column matches the (RE2-safe) regex (nulls fail). */
  case class MatchesRegex(column: String, pattern: String,
      minRatio: Double = 1.0) extends Rule {
    val name = s"regex($column)"
  }

  private def satisfied(r: Rule): Column = r match {
    case NotNull(c, _) => col(c).isNotNull
    case InRange(c, lo, hi, _) =>
      col(c).isNotNull && col(c) >= lo && col(c) <= hi
    case InSet(c, vs, _) => col(c).isNotNull && col(c).isInCollection(vs)
    case MatchesRegex(c, p, _) => col(c).isNotNull && col(c).rlike(p)
    case _: Unique => lit(true) // handled via countDistinct
  }

  /** Conjunction of the ROW-scoped rules (Unique is table-scoped and
    * excluded) — the predicate a validated-ingest path routes on.
    * Wrapped in coalesce(..., false) so a NULL predicate value (e.g. a
    * null column under a rule whose satisfied() is three-valued) routes
    * to quarantine instead of vanishing from both branches. */
  def rowPredicate(rules: Seq[Rule]): Column = {
    val rowRules = rules.filterNot(_.isInstanceOf[Unique])
    require(rowRules.nonEmpty, "no row-scoped rules")
    coalesce(rowRules.map(satisfied).reduce(_ && _), lit(false))
  }

  /** Evaluate the suite in one aggregate pass.
    * @return (rule, column, observed, threshold, pass) — one row per
    *         rule, deterministic order (the declared one). */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case (u: Unique, i) => countDistinct(col(u.column)).as(s"_m$i")
      case (r, i) => sum(when(satisfied(r), 1L).otherwise(0L)).as(s"_m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val verdicts = rules.zipWithIndex.map { case (r, i) =>
      struct(
        lit(i).as("ord"), lit(r.name).as("rule"),
        lit(r.column).as("column"),
        (col(s"_m$i").cast("double") / col("_n").cast("double"))
          .as("observed"),
        lit(r.minRatio).as("threshold"),
        (col(s"_m$i").cast("double") / col("_n").cast("double") >=
          r.minRatio).as("pass"))
    }
    one.select(explode(array(verdicts: _*)).as("v"))
      .select(col("v.ord"), col("v.rule"), col("v.column"),
        col("v.observed"), col("v.threshold"), col("v.pass"))
  }

  /** DuckDB mirror of [[evaluate]] over `fromSql`. */
  def evaluateSql(fromSql: String, rules: Seq[Rule]): String = {
    def satSql(r: Rule): String = r match {
      case NotNull(c, _) => s"CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END"
      case InRange(c, lo, hi, _) =>
        s"CASE WHEN $c IS NOT NULL AND $c >= $lo AND $c <= $hi THEN 1 ELSE 0 END"
      case InSet(c, vs, _) =>
        s"CASE WHEN $c IN (${vs.map(v => s"'$v'").mkString(", ")}) THEN 1 ELSE 0 END"
      case MatchesRegex(c, p, _) =>
        s"CASE WHEN $c IS NOT NULL AND regexp_matches($c, '$p') THEN 1 ELSE 0 END"
      case _: Unique => "1"
    }
    val ms = rules.zipWithIndex.map {
      case (u: Unique, i) => s"CAST(COUNT(DISTINCT ${u.column}) AS BIGINT) AS m$i"
      case (r, i) => s"CAST(SUM(${satSql(r)}) AS BIGINT) AS m$i"
    }
    val sel = rules.zipWithIndex.map { case (r, i) =>
      s"""SELECT $i AS ord, '${r.name}' AS rule, '${r.column}' AS "column",
         |  CAST(m$i AS DOUBLE) / CAST(n AS DOUBLE) AS observed,
         |  CAST(${r.minRatio} AS DOUBLE) AS threshold,
         |  CAST(m$i AS DOUBLE) / CAST(n AS DOUBLE) >= ${r.minRatio} AS pass
         |FROM g""".stripMargin
    }
    s"""WITH g AS (
       |  SELECT COUNT(*) AS n, ${ms.mkString(", ")}
       |  FROM ($fromSql))
       |${sel.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
