package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact join-cardinality pre-estimation — the planner arithmetic a
  * 100 TB pipeline runs BEFORE a join it cannot afford to discover is
  * explosive: |A ⋈ₖ B| = Σₖ f_A(k)·f_B(k), computed from the two
  * key-frequency tables. Pairs with [[KeySkew]]: skew says "salt",
  * this says "is the output even storable" (a many-to-many key with
  * f_A·f_B in the billions means the join itself is the bug).
  *
  * Scale shape per relation: each side collapses to its vocab-sized
  * (key, count) table with a map-side-combined aggregate — corpus rows
  * shuffle ONCE into frequency form, the estimation join then touches
  * vocab rows only. One full-outer join of the two frequency tables
  * feeds a single aggregate emitting side totals, the exact join
  * output size, and the worst single-key pair product (the straggler
  * bound). All BIGINT — the oracle hash-matches exactly.
  */
object JoinCardinality {

  /** One estimated relation. */
  final case class Relation(name: String, left: DataFrame, leftKey: String,
    right: DataFrame, rightKey: String)

  /** (relation, n_left, n_right, n_join_rows, max_key_pairs) — one row
    * per relation. `n_join_rows` is the EXACT inner equi-join output
    * size; `max_key_pairs` the largest single-key contribution. Null
    * keys never match (equi-join semantics), so they count toward the
    * side totals but not the join. */
  def estimate(relations: Seq[Relation]): DataFrame = {
    require(relations.nonEmpty)
    relations.map { r =>
      // a self-relation (same frame, same key — the fan-out audit on a
      // table joined to itself) needs ONE per-key pass, not two
      val sameSide = (r.right eq r.left) && r.rightKey == r.leftKey
      val fl0 = r.left.groupBy(col(r.leftKey).as("_k"))
        .agg(count(lit(1)).as("_cl"))
      val fl = if (sameSide) fl0.localCheckpoint(true) else fl0
      val fr =
        if (sameSide) fl.select(col("_k"), col("_cl").as("_cr"))
        else r.right.groupBy(col(r.rightKey).as("_k"))
          .agg(count(lit(1)).as("_cr"))
      // null keys survive groupBy as a null-key row; an equi-join would
      // drop them, so exclude the null row from the pair products but
      // keep it in the side totals
      val pair = when(col("_k").isNotNull,
        coalesce(col("_cl"), lit(0L)) * coalesce(col("_cr"), lit(0L)))
        .otherwise(lit(0L))
      fl.join(fr, Seq("_k"), "full_outer")
        .agg(
          sum(coalesce(col("_cl"), lit(0L))).as("n_left"),
          sum(coalesce(col("_cr"), lit(0L))).as("n_right"),
          sum(pair).as("n_join_rows"),
          max(pair).as("max_key_pairs"))
        .select(lit(r.name).as("relation"), col("n_left"), col("n_right"),
          col("n_join_rows"), col("max_key_pairs"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB mirror for one relation. */
  def relationSql(name: String, leftSql: String, lk: String,
      rightSql: String, rk: String): String =
    s"""SELECT '$name' AS relation,
       |  CAST(sum(coalesce(cl, 0)) AS BIGINT) AS n_left,
       |  CAST(sum(coalesce(cr, 0)) AS BIGINT) AS n_right,
       |  CAST(sum(CASE WHEN k IS NOT NULL
       |    THEN coalesce(cl, 0) * coalesce(cr, 0) ELSE 0 END) AS BIGINT)
       |    AS n_join_rows,
       |  CAST(max(CASE WHEN k IS NOT NULL
       |    THEN coalesce(cl, 0) * coalesce(cr, 0) ELSE 0 END) AS BIGINT)
       |    AS max_key_pairs
       |FROM (
       |  SELECT coalesce(fl.k, fr.k) AS k, cl, cr
       |  FROM (SELECT $lk AS k, CAST(count(*) AS BIGINT) AS cl
       |        FROM ($leftSql) l GROUP BY 1) fl
       |  FULL OUTER JOIN (SELECT $rk AS k, CAST(count(*) AS BIGINT) AS cr
       |        FROM ($rightSql) r GROUP BY 1) fr
       |  ON fl.k = fr.k) z""".stripMargin
}
