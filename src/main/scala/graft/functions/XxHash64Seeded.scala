package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.XxHash64

/** `xxh64_seeded(col, seed)` — Spark's native XxHash64 expression with
  * an explicit seed (the SQL-surface `xxhash64(...)` pins seed 42).
  * Registered so sketch point-queries (Count-Min row hashes use
  * seed = depth-row) can run executor-side inside codegen instead of
  * collecting sketches to the driver. The seed argument must be a
  * foldable literal — it parameterizes the expression, it is not data.
  */
object XxHash64Seeded {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "xxh64_seeded",
      exprs => XxHash64(Seq(exprs.head),
        exprs(1).eval().asInstanceOf[Number].longValue),
      "scala_udf")
}
