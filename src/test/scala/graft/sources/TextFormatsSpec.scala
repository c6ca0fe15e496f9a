package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TextFormatsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def parquetDigest() =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq

  // specs use their own trees: the gate paths belong to the verify run
  // (a concurrent verify+test run must not clobber each other's files)
  test("JSONL write → schema'd readback is byte-faithful to the parquet source") {
    val got = TextFormats.jsonlInterop(spark, sfDir, "/tmp/graft_spec_jsonl")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === parquetDigest())
  }

  test("CSV write → schema'd readback is byte-faithful to the parquet source") {
    val got = TextFormats.csvInterop(spark, sfDir, "/tmp/graft_spec_csv")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === parquetDigest())
  }

  test("ORC write → schema'd readback is byte-faithful to the parquet source") {
    val got = TextFormats.orcRoundtrip(spark, sfDir, "/tmp/graft_spec_orc")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === parquetDigest())
  }
}
