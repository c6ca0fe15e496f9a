package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC changelog application: collapse an insert/update/delete change
  * stream to the final snapshot — [[graft.streaming.LiveMerge]]'s
  * last-write-wins state extended with DELETE semantics (the piece
  * `Dims.upsert` cannot express without Delta). The warehouse
  * pattern for ingesting a Debezium/binlog-style feed.
  *
  * Scale shape: one shuffle on the key, one window pass picking the
  * latest change (ties break on the unique change id), then a narrow
  * filter dropping keys whose final op is a delete. No join against
  * the previous snapshot is needed when the changelog carries full
  * rows (as here); a partial-update feed would instead MERGE on the
  * key, which is `Dims.upsert`.
  */
object Cdc {

  /** @param changes (user_id, ev_us, event_id, op, value) rows;
    *                op ∈ I/U/D. Latest op per key wins; final D = gone.
    * @return (user_id, value, updated_us) — the surviving snapshot. */
  def applyChangelog(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ev_us").desc, col("event_id").desc)
    changes
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("value"),
        col("ev_us").as("updated_us"))
  }

  /** DuckDB oracle for the gate's event_type→op derivation + apply. */
  def applyChangelogSql(evUsSql: String): String =
    s"""WITH ch AS (
       |  SELECT user_id, $evUsSql AS us, event_id,
       |    CASE event_type WHEN 'signup' THEN 'I'
       |      WHEN 'purchase' THEN 'D' ELSE 'U' END AS op,
       |    value
       |  FROM events),
       |ranked AS (
       |  SELECT user_id, us, op, value,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY us DESC, event_id DESC) AS rn
       |  FROM ch)
       |SELECT user_id, value, us AS updated_us
       |FROM ranked WHERE rn = 1 AND op <> 'D'""".stripMargin
}
