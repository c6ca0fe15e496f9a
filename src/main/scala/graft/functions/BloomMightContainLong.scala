package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: Bloom-filter membership test of a long
  * hash column against a driver-built sketch. The third native
  * expression in the engine (after vec_dot and nfc_normalize), and for
  * the same reason: doGenCode inlines `filter.mightContainLong(h)`
  * straight into whole-stage codegen — no UDF boxing, no per-row Scala
  * call, and the scan+filter stage stays one codegen span, so a
  * 100 TB incremental-dedup pass is a single narrow scan.
  *
  * The serialized sketch ships with the expression (plan broadcast);
  * each executor deserializes it once (lazy, transient).
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a BIGINT hash, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter =
    BloomFilterAgg.deserialize(filterBytes)

  override def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $f.mightContainLong($h);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomMightContainLong {
  /** Register `graft_bloom_mc(h)` bound to `bytes` in the session's
    * registry so expr() call sites stay plain SQL strings. The builder
    * lambda closes over the sketch; re-registration overwrites (same
    * idempotent pattern as vec_dot). */
  def register(spark: SparkSession, bytes: Array[Byte]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_mc", exprs => BloomMightContainLong(exprs.head, bytes),
      "scala_udf")

  /** Content-addressed registration: the function name embeds the
    * FULL md5 of the sketch bytes (a 32-bit hashCode would collide by
    * pigeonhole across many filters and last-registration-wins would
    * silently misroute membership tests), so two live filters in one
    * session can't race on a shared name. NOTE the retention cost:
    * each builder lambda closes over the FULL serialized sketch —
    * ~1.2 GB per 10⁹-doc filter at 1% fpp — and the registry pins it
    * for the session lifetime per distinct filter. Long-lived sessions
    * that build many filters should [[deregister]] once the plans that
    * reference a filter have been materialized.
    * @return the registered function name to splice into expr(). */
  def registerUnique(spark: SparkSession, bytes: Array[Byte]): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val name = "graft_bloom_mc_" + md5.map("%02x".format(_)).mkString
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomMightContainLong(exprs.head, bytes), "scala_udf")
    name
  }

  /** Drop a [[registerUnique]] entry, releasing the driver's reference
    * to the captured sketch bytes. Safe once every plan using the name
    * has been executed (already-analyzed plans hold their own copy of
    * the expression); lazy plans analyzed AFTER the drop fail to
    * resolve the name. @return true if the name was registered. */
  def deregister(spark: SparkSession, name: String): Boolean =
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))
}
