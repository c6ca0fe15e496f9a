package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the cross-table complement of
  * [[Profile]]: for each declared FK relationship, how many child rows
  * reference a parent key that does not exist? A nonzero orphan count
  * on a fresh 100 TB drop means the upstream snapshot was cut
  * mid-transaction (or a partition went missing) — the audit catches
  * it BEFORE a downstream inner join silently drops those rows.
  *
  * Scale shape per relation: the parent side collapses to DISTINCT
  * keys first (dim-sized), then one left-anti join keyed on the FK —
  * the same shuffle the production join would do, so the audit is
  * never more expensive than the pipeline it protects. AQE broadcasts
  * the deduped parent when it fits. Relations evaluate independently
  * (a union of 1-row aggregates), so one plan audits the whole
  * schema.
  */
object IntegrityAudit {

  /** One audited FK relationship. */
  final case class Relation(name: String, child: DataFrame, fkCol: String,
    parent: DataFrame, pkCol: String)

  /** (relation, n_child, n_orphans, orphan_share) — one row per
    * relation. Null FKs count as orphans (they'd drop in an inner
    * join, which is what the audit protects). */
  def audit(relations: Seq[Relation]): DataFrame = {
    require(relations.nonEmpty)
    relations.map { r =>
      // ONE child pass: a left join against the distinct parent keys
      // yields total and orphan counts together (a null-joined _pk ≡
      // the left_anti match failure, including null FKs, which never
      // equi-match) — the anti-join + separate count form scanned the
      // child twice per relation (scan-censused 9 source scans)
      val parentKeys = r.parent.select(col(r.pkCol).as("_pk")).distinct()
      r.child.select(col(r.fkCol).as("_fk"))
        .join(parentKeys, col("_fk") === col("_pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          // coalesce: SUM over an EMPTY child is NULL where the old
          // anti-join count (and the DuckDB mirror's COUNT(*)) said 0 —
          // and an empty snapshot is exactly what this audit catches
          coalesce(sum(when(col("_pk").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans"))
        .select(lit(r.name).as("relation"), col("n_child"), col("n_orphans"),
          // lazy CASE: under ANSI the division THROWS on an empty
          // child (0/0) — the share is NULL there, counts still report
          when(col("n_child") > 0,
            col("n_orphans").cast("double") / col("n_child").cast("double"))
            .as("orphan_share"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB mirror for one relation: anti-join via NOT EXISTS (null
    * FKs orphan there too, matching the left-anti null semantics). */
  def relationSql(name: String, childSql: String, fk: String,
      parentSql: String, pk: String): String =
    s"""SELECT '$name' AS relation,
       |  CAST((SELECT count(*) FROM ($childSql) c0) AS BIGINT) AS n_child,
       |  CAST((SELECT count(*) FROM ($childSql) c
       |        WHERE NOT EXISTS (SELECT 1 FROM ($parentSql) p
       |                          WHERE p.$pk = c.$fk)) AS BIGINT) AS n_orphans,
       |  CASE WHEN (SELECT count(*) FROM ($childSql) c0) > 0 THEN
       |    CAST((SELECT count(*) FROM ($childSql) c
       |          WHERE NOT EXISTS (SELECT 1 FROM ($parentSql) p
       |                            WHERE p.$pk = c.$fk)) AS DOUBLE)
       |      / CAST((SELECT count(*) FROM ($childSql) c0) AS DOUBLE)
       |  END AS orphan_share""".stripMargin
}
