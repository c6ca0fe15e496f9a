package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the step after record linkage in any
  * master-data/entity-resolution pipeline (the "merge" of
  * match-merge): linked records collapse to ONE surviving entity row
  * whose attributes are chosen by per-attribute rules. Rules here are
  * the two canonical ones: numeric → MAX across members (most
  * favorable value), categorical → MODE with a lexicographic
  * tiebreak; the entity's display name survives from the reference
  * (trusted) side. Extending to more attributes is one more aggregate
  * column per rule.
  *
  * Scale shape: members = reference ∪ re-keyed matched probes (two
  * equi joins against the bounded linkage pair table), then two
  * hash-aggregates on the entity key (base stats + categorical mode)
  * joined back — every shuffle is on the entity key, nothing
  * all-pairs. The deterministic mode (count desc, value asc, via a
  * min-of-struct) is what keeps the gate hash-exact.
  */
object GoldenRecord {

  /** @param pairs linkage output: (probe_key, ref_key) at most one row
    *              per probe ([[RecordLinkage.bestMatch]] shape).
    * @return one row per LINKED entity: (entity, n_members,
    *         golden_name, golden_<numAttr>, golden_<catAttr>). */
  def survivorship(reference: DataFrame, probe: DataFrame,
      pairs: DataFrame, refKey: String, probeKey: String, nameCol: String,
      numAttr: String, catAttr: String): DataFrame = {
    // pairs feeds BOTH member branches; materialize once so an
    // expensive upstream (a full linkage run) doesn't execute twice
    // (the SemDedup assigned-table checkpoint precedent — measured
    // 9.0 → 6.2 s on the gate at sf0.1)
    val p = pairs.select(col("probe_key"), col("ref_key"))
      .localCheckpoint(true)
    val linked = p.select(col("ref_key").as("entity")).distinct()
    val refMembers = reference
      .join(linked, reference(refKey) === linked("entity"))
      .select(col("entity"), col(nameCol).as("name"),
        col(numAttr).as("num"), col(catAttr).as("cat"),
        lit(true).as("is_ref"))
    val probeMembers = probe
      .join(p, probe(probeKey) === col("probe_key"))
      .select(col("ref_key").as("entity"), col(nameCol).as("name"),
        col(numAttr).as("num"), col(catAttr).as("cat"),
        lit(false).as("is_ref"))
    val members = refMembers.unionByName(probeMembers)
    // ONE pass over members (r15): the base stats stack on top of the
    // mode's (entity, cat) level — count/max are associative, so
    // n_members = Σ per-cat counts and the maxes fold through — where
    // the old base ⨝ mode spelling re-executed the whole member-
    // building lineage once per aggregate branch (different grouping
    // keys, so no exchange reuse).
    members.groupBy(col("entity"), col("cat"))
      .agg(count(lit(1)).as("c"),
        max(when(col("is_ref"), col("name"))).as("_nm"),
        max(col("num")).as("_nx"))
      .groupBy(col("entity"))
      .agg(sum(col("c")).as("n_members"),
        max(col("_nm")).as("golden_name"),
        max(col("_nx")).as(s"golden_$numAttr"),
        min(struct((-col("c")).as("nc"), col("cat").as("v"))).as("m"))
      .select(col("entity"), col("n_members"), col("golden_name"),
        col(s"golden_$numAttr"), col("m.v").as(s"golden_$catAttr"))
  }

  /** DuckDB mirror. `pairsSql` must yield (probe_key, ref_key);
    * `refSql`/`probeSql` the member columns. */
  def survivorshipSql(refSql: String, probeSql: String, pairsSql: String,
      refKey: String, probeKey: String, nameCol: String,
      numAttr: String, catAttr: String): String =
    s"""WITH pairs AS ($pairsSql),
       |members AS (
       |  SELECT r.$refKey AS entity, r.$nameCol AS name,
       |         r.$numAttr AS num, r.$catAttr AS cat, TRUE AS is_ref
       |  FROM ($refSql) r
       |  JOIN (SELECT DISTINCT ref_key FROM pairs) l ON r.$refKey = l.ref_key
       |  UNION ALL
       |  SELECT p2.ref_key AS entity, p.$nameCol AS name,
       |         p.$numAttr AS num, p.$catAttr AS cat, FALSE AS is_ref
       |  FROM ($probeSql) p
       |  JOIN pairs p2 ON p.$probeKey = p2.probe_key),
       |base AS (
       |  SELECT entity, CAST(count(*) AS BIGINT) AS n_members,
       |    MAX(CASE WHEN is_ref THEN name END) AS golden_name,
       |    MAX(num) AS golden_$numAttr
       |  FROM members GROUP BY 1),
       |mode AS (
       |  SELECT entity, cat AS golden_$catAttr FROM (
       |    SELECT entity, cat,
       |      row_number() OVER (PARTITION BY entity
       |        ORDER BY count(*) DESC, cat) AS rn
       |    FROM members GROUP BY entity, cat) t
       |  WHERE rn = 1)
       |SELECT b.entity, b.n_members, b.golden_name, b.golden_$numAttr,
       |  m.golden_$catAttr
       |FROM base b JOIN mode m USING (entity)""".stripMargin
}
