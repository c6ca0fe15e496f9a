package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel properties of the truncated-EWMA window gate (`w_ewma`):
  * the normalized 0.75^i weighting must behave like an average on
  * constant input, equal the raw value on each partition's first row
  * (warm-up normalization), and weight recent values above old ones. */
class EwmaSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("ewma of the real corpus: first event per user equals its value") {
    val df = SparkEntry.queries("w_ewma")(spark, sfDir)
    val ev = QueryDsl.events(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val firsts = ev
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("value"))
    val joined = df.join(firsts.withColumnRenamed("value", "v0"), "event_id")
    val bad = joined
      .filter(abs(col("ewma") - round(col("v0"), 6)) > 1e-9).count()
    assert(bad === 0L)
  }

  test("constant series → ewma equals the constant at every depth") {
    import spark.implicits._
    val ev = (1 to 20).map(i => (i.toLong, 7L, 42.5, i.toLong * 1000L))
      .toDF("event_id", "user_id", "value", "ev_us")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val terms = (0 until 8).map { i =>
      val c = if (i == 0) col("value") else lag(col("value"), i).over(w)
      (c, math.pow(0.75, i))
    }
    val num = terms.map { case (c, wt) => coalesce(c * lit(wt), lit(0.0)) }.reduce(_ + _)
    val den = terms.map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
    val out = ev.withColumn("ewma", round(num / den, 6)).select("ewma").collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - 42.5) < 1e-9))
  }

  test("recency dominance: a jump moves ewma more than an old jump") {
    import spark.implicits._
    // same multiset of values; series A has the spike last, B first
    def series(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, v, i.toLong * 1000L) }
    val a = series(Seq(0.0, 0.0, 0.0, 0.0, 100.0)).toDF("event_id", "user_id", "value", "ev_us")
    val b = series(Seq(100.0, 0.0, 0.0, 0.0, 0.0)).toDF("event_id", "user_id", "value", "ev_us")
    def lastEwma(df: org.apache.spark.sql.DataFrame): Double = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
      val terms = (0 until 8).map { i =>
        val c = if (i == 0) col("value") else lag(col("value"), i).over(w)
        (c, math.pow(0.75, i))
      }
      val num = terms.map { case (c, wt) => coalesce(c * lit(wt), lit(0.0)) }.reduce(_ + _)
      val den = terms.map { case (c, wt) =>
        when(c.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
      df.withColumn("ewma", num / den)
        .orderBy(desc("ev_us")).limit(1).select("ewma").head.getDouble(0)
    }
    assert(lastEwma(a) > lastEwma(b))
  }
}
