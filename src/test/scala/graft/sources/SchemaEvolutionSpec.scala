package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val contract = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),    // added in v2 files
    StructField("planned", StringType))) // in no file yet

  private def writeFixture(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("schema-evo").toString
    val v1 = s"$base/y=2023"; val v2 = s"$base/y=2024"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(v1)
    Seq((3L, "c", 0.5), (4L, "d", 0.9), (5L, "e", 0.1))
      .toDF("id", "name", "score").write.mode("overwrite").parquet(v2)
    (v1, v2)
  }

  test("mergeSchema read conforms to the contract across file generations") {
    val (v1, v2) = writeFixture()
    val df = SchemaEvolution.readConformed(spark, contract, v1, v2)
    assert(df.schema === contract)
    val rows = df.collect().map(r => (r.getLong(0),
      Option(r.get(2)).map(_.asInstanceOf[Double]), r.isNullAt(3)))
    assert(rows.length === 5)
    // v1 rows: score null-filled; v2 rows: real values; 'planned'
    // (in no file) is null everywhere but typed per the contract
    assert(rows.filter(_._1 <= 2).forall(_._2.isEmpty))
    assert(rows.filter(_._1 >= 3).forall(_._2.nonEmpty))
    assert(rows.forall(_._3))
  }

  test("old readers ignore new experimental columns") {
    val (v1, v2) = writeFixture()
    val narrow = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = SchemaEvolution.readConformed(spark, narrow, v1, v2)
    assert(df.columns.toSeq === Seq("id", "name"))
    assert(df.count() === 5)
  }

  test("contract projection keeps the scan pruned despite footer merging") {
    val (v1, v2) = writeFixture()
    val df = SchemaEvolution.readConformed(spark, contract, v1, v2)
      .select("id", "score")
    val scan = df.queryExecution.executedPlan.toString
    // ReadSchema must carry only the two requested physical columns
    // (planned doesn't exist on disk; name must be pruned away)
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("name"), s"scan not pruned:\n$scan")
    // filters on contract columns still push down to the scan
    val filtered = SchemaEvolution.readConformed(spark, contract, v1, v2)
      .filter(col("id") > 2L)
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      s"filter not pushed:\n$fplan")
  }
}
