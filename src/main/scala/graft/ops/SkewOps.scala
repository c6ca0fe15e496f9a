package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for 100 TB-scale aggregation (SURVEY §7.8
  * "salting guards"). AQE handles skewed JOINS at runtime; skewed
  * AGGREGATION keys still funnel into one reducer — salting splits a
  * hot key across `buckets` partial groups, then merges. Only
  * decomposable aggregates are offered (sum/count/min/max re-aggregate
  * exactly; avg = sum/count at the merge step).
  */
object SkewOps {

  /** Two-phase salted aggregation. `aggs` maps output name →
    * (inputCol, op) with op ∈ sum|count|min|max|avg. Results are
    * exactly equal to a direct groupBy (decimal-exact for count/min/
    * max; sum/avg associativity caveats identical to plain Spark). */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
      aggs: Map[String, (String, String)]): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(exprsPartial(aggs).head, exprsPartial(aggs).tail: _*)
    val merged = partial.groupBy(keys.map(col): _*)
      .agg(exprsMerge(aggs).head, exprsMerge(aggs).tail: _*)
    aggs.foldLeft(merged) { case (d, (name, (_, op))) =>
      if (op == "avg") d.withColumn(name, col(s"_sum_$name") / col(s"_cnt_$name"))
        .drop(s"_sum_$name", s"_cnt_$name")
      else d
    }
  }

  /** Salted equi-join — the hot-key guard for skewed JOINS when the dim
    * side is too big to broadcast and AQE's runtime split is
    * unavailable (e.g. the join feeds a co-partitioned downstream op).
    * The fact side gets a deterministic per-row salt (hash of
    * `saltOn`, so replays are identical); the dim side is replicated
    * `buckets`× with one row per salt value. The join key becomes
    * (key, salt), so one hot key spreads across `buckets` reducers.
    * Every fact row matches exactly ONE replica of its dim row →
    * result ≡ the plain join, row for row. Cost: dim side shuffles
    * `buckets`× its size — the usual salting trade, cheap when
    * |dim| ≪ |fact| (the case where skew hurts most).
    *
    * `factKey`/`dimKey` join columns stay in the output (both sides,
    * as in a plain inner join); `_salt` is dropped. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, buckets: Int, saltOn: Seq[String]): DataFrame = {
    require(buckets > 0)
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltOn.map(col): _*), lit(buckets.toLong)))
    val replDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    saltedFact.join(replDim,
        saltedFact(factKey) === replDim(dimKey) &&
          saltedFact("_salt") === replDim("_salt"))
      .drop("_salt")
  }

  private def exprsPartial(aggs: Map[String, (String, String)]): Seq[Column] =
    aggs.toSeq.flatMap { case (name, (c, op)) =>
      op match {
        case "sum" => Seq(sum(col(c)).as(s"_p_$name"))
        case "count" => Seq(count(col(c)).as(s"_p_$name"))
        case "min" => Seq(min(col(c)).as(s"_p_$name"))
        case "max" => Seq(max(col(c)).as(s"_p_$name"))
        case "avg" => Seq(sum(col(c)).as(s"_psum_$name"),
          count(col(c)).as(s"_pcnt_$name"))
        case other => throw new IllegalArgumentException(
          s"non-decomposable aggregate: $other")
      }
    }

  private def exprsMerge(aggs: Map[String, (String, String)]): Seq[Column] =
    aggs.toSeq.flatMap { case (name, (_, op)) =>
      op match {
        case "sum" => Seq(sum(col(s"_p_$name")).as(name))
        case "count" => Seq(sum(col(s"_p_$name")).as(name))
        case "min" => Seq(min(col(s"_p_$name")).as(name))
        case "max" => Seq(max(col(s"_p_$name")).as(name))
        case "avg" => Seq(sum(col(s"_psum_$name")).as(s"_sum_$name"),
          sum(col(s"_pcnt_$name")).as(s"_cnt_$name"))
      }
    }
}
