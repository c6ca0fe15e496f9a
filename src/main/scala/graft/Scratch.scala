package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe main for verifying Spark 4 type behavior against the
  * testdata files (ns timestamps, ANSI casts, epoch functions).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$d/events.parquet")
    ev.printSchema()
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    li.printSchema()
    ev.select(
      col("ts"),
      expr("ts div 1000").as("ts_us"),
      timestamp_micros(expr("ts div 1000")).as("tstamp")
    ).select(col("*"), year(col("tstamp")).as("y"),
      date_trunc("hour", col("tstamp")).as("h"),
      unix_timestamp(col("tstamp")).as("epoch_s"),
      unix_micros(col("tstamp")).as("epoch_us")
    ).show(3, false)
    li.select(col("l_shipdate"), to_date(col("l_shipdate")).as("dt"),
      year(col("l_shipdate")).as("y")).show(2)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    emb.printSchema()
    emb.select(expr("aggregate(zip_with(embedding, embedding, (a,b) -> cast(a as double)*b), 0d, (acc,x) -> acc + x)").as("sqnorm")).show(2)
    spark.stop()
  }
}
