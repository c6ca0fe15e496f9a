package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution-tolerant parquet reading — the scan reality of a
  * 100 TB table written over years: early files lack columns that
  * later files carry (and vice versa). Spark's `mergeSchema` unions
  * the file footers at planning time and null-fills per file at scan
  * time; this wrapper adds the two guarantees a pipeline actually
  * needs on top:
  *
  *  1. a STABLE CONTRACT schema: callers pin the expected columns —
  *     columns the merged footprint lacks entirely are synthesized as
  *     typed nulls (reading a pre-migration directory still yields
  *     the contract shape), and extra experimental columns are
  *     dropped rather than leaking downstream;
  *  2. scan efficiency is preserved: the contract projection prunes
  *     to the requested columns, so footer merging never widens the
  *     actual read (ReadSchema stays the contract ∩ file columns;
  *     SchemaEvolutionSpec asserts the pruned scan plan).
  */
object SchemaEvolution {

  /** Read `paths` with footer merging, then conform to `contract`:
    * missing columns → typed nulls, extra columns → dropped. */
  def readConformed(spark: SparkSession, contract: StructType,
      paths: String*): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    val present = merged.columns.toSet
    merged.select(contract.fields.toSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
