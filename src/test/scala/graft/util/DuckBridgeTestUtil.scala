package graft.util

/** Shared test-side DuckDB bridge (the same python3 path the oracle
  * harness uses): run a SQL string, get rows of nullable integer
  * strings back. Specs `assume` on [[duckAvailable]] so a missing
  * bridge cancels rather than passing vacuously. */
object DuckBridgeTestUtil {

  def duckAvailable: Boolean =
    scala.util.Try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    }.getOrElse(false)

  /** Run one SQL in DuckDB; returns rows of nullable-string cells
    * (integer-valued columns only — same minimal no-dependency JSON
    * parse as the oracle-side tooling). */
  def duck(sql: String): Seq[Seq[Option[String]]] = {
    val f = java.io.File.createTempFile("duck_bridge_test", ".sql")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, sql.getBytes("UTF-8"))
    val script =
      """import sys, json, duckdb
        |rows = duckdb.sql(open(sys.argv[1], encoding='utf-8').read()).fetchall()
        |print(json.dumps([[None if c is None else str(c) for c in r] for r in rows]))
        |""".stripMargin
    val pb = new ProcessBuilder("python3", "-c", script, f.getAbsolutePath)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"duckdb bridge failed: $out")
    val cell = """null|"(-?[0-9]+)"""".r
    val row = """\[((?:null|"-?[0-9]+")(?:,\s*(?:null|"-?[0-9]+"))*)?\]""".r
    row.findAllMatchIn(out.trim.drop(1).dropRight(1)).map { m =>
      cell.findAllMatchIn(Option(m.group(1)).getOrElse("")).map { c =>
        Option(c.group(1))
      }.toSeq
    }.toSeq
  }

  def sq(s: String): String = "'" + s.replace("'", "''") + "'"
}
