package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL and CSV source/sink interop for the documents corpus.
  *
  * JSONL is the lingua franca of LLM training corpora (every public
  * text dump — C4, The Pile, RedPajama, FineWeb — ships as
  * newline-delimited JSON), and CSV is the ubiquitous ingest edge; an
  * engine claiming the corpus-pipeline surface must produce files OTHER
  * tools read and read files other tools produce. Same interop-gate
  * style as the S5 parquet warehouse gates: the engine WRITES the tree
  * to a fixed path, reads its own files back through an explicit schema
  * (no inference in the measured path — schema inference is a full
  * extra pass at 100 TB), and the DuckDB oracle reads THE SAME FILES,
  * so a hash match proves standard on-disk bytes, not just a Spark
  * round-trip.
  *
  * Scale shape: both writers are embarrassingly parallel narrow maps
  * (one file per task, no shuffle); `text` is carried as md5 in the
  * gate output so the comparison stays row-sized while still pinning
  * every byte of the payload.
  */
object TextFormats {

  val jsonlRoot = "/tmp/graft_gate_jsonl"
  val csvRoot = "/tmp/graft_gate_csv"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")

  private def digest(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
      md5(col("text").cast("binary")).as("text_md5"))

  /** Write documents as newline-delimited JSON, read back through the
    * explicit schema. The oracle reads the same part files. `root` is
    * overridable so SPECS write to their own tree — a concurrent test
    * run must never clobber the gate fixture between the gate's write
    * and the oracle's read (observed once when verify and the test
    * suite ran concurrently; distinct paths remove the class). */
  def jsonlInterop(s: SparkSession, d: String): DataFrame =
    jsonlInterop(s, d, jsonlRoot)
  def jsonlInterop(s: SparkSession, d: String, root: String): DataFrame = {
    docs(s, d).write.mode("overwrite").json(root)
    digest(s.read.schema(docSchema).json(root))
  }

  def jsonlInteropSql: String =
    s"""SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
       |FROM read_json('$jsonlRoot/*.json', format = 'newline_delimited',
       |  columns = {doc_id: 'BIGINT', text: 'VARCHAR', lang: 'VARCHAR',
       |             source: 'VARCHAR', n_chars: 'BIGINT'})""".stripMargin

  /** Write documents as headered CSV, read back through the explicit
    * schema. Corpus text is word-and-space only, but the writer is
    * standard RFC-4180 quoting either way — the foreign read IS the
    * check that nothing needed escaping that didn't get it. */
  def csvInterop(s: SparkSession, d: String): DataFrame =
    csvInterop(s, d, csvRoot)
  def csvInterop(s: SparkSession, d: String, root: String): DataFrame = {
    docs(s, d).write.mode("overwrite").option("header", "true").csv(root)
    digest(s.read.schema(docSchema).option("header", "true").csv(root))
  }

  def csvInteropSql: String =
    s"""SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
       |FROM read_csv('$csvRoot/*.csv', header = true,
       |  columns = {'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR',
       |             'source': 'VARCHAR', 'n_chars': 'BIGINT'})""".stripMargin

  val orcRoot = "/tmp/graft_gate_orc"

  /** ORC write → schema'd readback. DuckDB has no ORC reader, so this
    * is a SEMANTIC gate (the s6 style): the oracle re-derives the
    * digest from the parquet source table, and any value mangled or
    * row lost through the ORC columnar round-trip hash-mismatches. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame =
    orcRoundtrip(s, d, orcRoot)
  def orcRoundtrip(s: SparkSession, d: String, root: String): DataFrame = {
    docs(s, d).write.mode("overwrite").orc(root)
    digest(s.read.schema(docSchema).orc(root))
  }

  def orcRoundtripSql: String =
    """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      |FROM documents""".stripMargin
}
