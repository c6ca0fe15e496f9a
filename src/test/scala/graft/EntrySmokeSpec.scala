package graft
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
class EntrySmokeSpec extends AnyFunSuite {
  test("driver entry smoke: rows > 0 on sf0.001 with a plain session") {
    val spark = graft.SparkTestBase.spark
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
