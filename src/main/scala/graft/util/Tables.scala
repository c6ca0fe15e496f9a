package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated synthetic tables (TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Per-corpus tag for gate-written artifact paths. Interop gates that
    * write parquet for the DuckDB oracle to re-read (the S5 pattern)
    * historically used ONE fixed /tmp path per gate; two processes
    * running the same gate against different SF dirs then race on it
    * (the r8 false-failure class). Deriving the path from the data dir
    * gives each corpus its own artifact tree. Oracle SQL is static per
    * the SparkEntry contract, so builders embed the literal
    * [[SfTagToken]] and [[graft.Verify]] substitutes the tag computed
    * from ITS sfDir argument when dumping oracle_sql.json — the same
    * value a gate fn computes from its `dir` argument at run time. */
  val SfTagToken = "__SFTAG__"
  def corpusTag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9._-]", "_").replaceAll("^_+", "")
}
