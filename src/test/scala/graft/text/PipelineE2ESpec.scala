package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composed end-to-end pretraining-data pipeline over the real corpus:
  * quality filter + near-dup removal → deterministic split → per-lang
  * token budget → sequence packing → epoch shuffle. Each stage is
  * individually oracle-gated; THIS spec checks the seams — the
  * conservation invariants that must hold when the stages compose
  * (the bugs integration hits are at stage boundaries, not inside
  * gates).
  */
class PipelineE2ESpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val filtered = CorpusPipeline.filteredCorpus(docs, 0.5)
  private lazy val filteredDocs =
    docs.join(filtered.select("doc_id"), Seq("doc_id"), "left_semi")
  private lazy val split = CorpusPipeline.trainTestSplit(filteredDocs, 0.8)
  private lazy val trainDocs = filteredDocs.join(
    split.where(col("split") === "train").select("doc_id"),
    Seq("doc_id"), "left_semi")
  private lazy val budget = CorpusPipeline.tokenBudgetSelect(trainDocs, 3000L)
  private lazy val budgetDocs = trainDocs.join(
    budget.select("doc_id"), Seq("doc_id"), "left_semi")
  private lazy val packed = CorpusPipeline.packSequences(budgetDocs, 128L)
  private lazy val shuffled = CorpusPipeline.epochShuffle(budgetDocs, 1, 4)

  test("filter stage: strict subset, unique ids, no exact dup survives") {
    val total = docs.count()
    val kept = filtered.count()
    assert(kept > 0 && kept < total)
    assert(filtered.select("doc_id").distinct().count() === kept)
    val maxDupTexts = filteredDocs
      .groupBy(md5(col("text").cast("binary"))).count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxDupTexts === 1L)
  }

  test("split stage: partitions the filtered set exactly") {
    val n = filteredDocs.count()
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum === n)
    assert(byLabel.keySet.subsetOf(Set("train", "test")))
    assert(byLabel.getOrElse("train", 0L) > 0L)
  }

  test("budget stage: selected docs are train docs within per-lang budget") {
    val over = budget.groupBy("lang").agg(sum("n_tokens").as("t"))
      .where(col("t") > 3000L).count()
    assert(over === 0L)
    val notInTrain = budget.select("doc_id").join(
      trainDocs.select("doc_id"), Seq("doc_id"), "left_anti").count()
    assert(notInTrain === 0L)
  }

  test("packing stage: offsets are exact per-lang prefix sums") {
    val checks = packed.groupBy("lang")
      .agg(sum("n_tokens").as("total"),
        max(col("offset") + col("n_tokens")).as("hi"),
        min("offset").as("lo"))
      .collect()
    assert(checks.nonEmpty)
    checks.foreach { r =>
      assert(r.getAs[Long]("total") === r.getAs[Long]("hi"))
      assert(r.getAs[Long]("lo") === 0L)
    }
    val badChunk = packed
      .where(col("chunk_id") =!= floor(col("offset") / 128L)).count()
    assert(badChunk === 0L)
  }

  test("epoch shuffle: a row-conserving permutation into dense shards") {
    val ids = budgetDocs.select("doc_id")
    assert(shuffled.select("doc_id").except(ids).count() === 0L)
    assert(ids.except(shuffled.select("doc_id")).count() === 0L)
    val dense = shuffled.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos_in_shard").as("hi"),
        min("pos_in_shard").as("lo"))
      .where(col("hi") =!= col("n") || col("lo") =!= 1L).count()
    assert(dense === 0L)
    val badShard = shuffled
      .where(col("shard") < 0 || col("shard") >= 4).count()
    assert(badShard === 0L)
  }

  test("split assignment is stable across recomputation (no rand axis)") {
    val a = split.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = CorpusPipeline.trainTestSplit(filteredDocs, 0.8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a === b)
  }
}
