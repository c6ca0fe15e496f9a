package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("planted extreme value is the only flagged outlier") {
    // 99 docs of length ~100 (±2) and one 50_000-char artifact:
    // med≈100, MAD≈1 → only the artifact exceeds med + 3·MAD
    val lens = (1 to 99).map(i => ("en", 98L + (i % 5))) :+ (("en", 50000L))
    val df = lens.toDF("lang", "n_chars")
    val out = RobustStats.madOutliers(df, "lang", "n_chars").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 100L)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(math.abs(r.getAs[Double]("med") - 100.0) <= 2.0)
  }

  test("constant group: MAD = 0 and zero outliers") {
    val df = (1 to 50).map(_ => ("de", 500L)).toDF("lang", "n_chars")
    val r = RobustStats.madOutliers(df, "lang", "n_chars").collect().head
    assert(r.getAs[Double]("mad") === 0.0)
    assert(r.getAs[Long]("n_outliers") === 0L)
  }

  test("robustness: growing the artifact 100× leaves the threshold unchanged") {
    // med and MAD must not depend on the artifact's magnitude — the
    // breakdown property mean/stddev thresholds lack
    val base = (1 to 99).map(i => ("en", 98L + (i % 5)))
    val a = (base :+ (("en", 50000L))).toDF("lang", "n_chars")
    val b = (base :+ (("en", 5000000L))).toDF("lang", "n_chars")
    val ra = RobustStats.madOutliers(a, "lang", "n_chars").collect().head
    val rb = RobustStats.madOutliers(b, "lang", "n_chars").collect().head
    assert(ra.getAs[Double]("med") === rb.getAs[Double]("med"))
    assert(ra.getAs[Double]("mad") === rb.getAs[Double]("mad"))
    assert(rb.getAs[Long]("n_outliers") === 1L)
  }

  test("real corpus gate output: outlier fraction is sane (<20% per lang)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    RobustStats.madOutliers(docs, "lang", "n_chars").collect().foreach { r =>
      val frac = r.getAs[Long]("n_outliers").toDouble / r.getAs[Long]("n_docs")
      assert(frac < 0.2, s"lang ${r.getString(0)} flags $frac of docs")
    }
  }
}
