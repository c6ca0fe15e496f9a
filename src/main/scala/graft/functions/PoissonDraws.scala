package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All B Poisson-bootstrap multiplicities of one row in ONE array
  * (r15 optimization): the md5-drawn bootstrap gate used to explode B
  * replicate ids per row and push B× the rows through Generate + hash
  * aggregation just to draw per-(row, b) multiplicities; this
  * expression emits m(row, 0..B-1) in one pass so the replicate sums
  * can ride 2B plain codegen'd sum() columns over the ORIGINAL row
  * count (see [[graft.ops.Bootstrap.meanCi]]). md5 mode only — the
  * xxh64 production draw is so cheap inside codegen that the exploded
  * spelling measured faster than any per-row array (see meanCi notes).
  *
  * Draw equivalence (bit-identical to the exploded spelling): u =
  * md5_prefix_long(concat(idStr, ':', bStr), 6) % 1e6 — the SAME
  * [[Md5Prefix.prefixLong]] kernel over the SAME concat bytes; m =
  * inverse Poisson(1) CDF over the 1e6 grid (the [[graft.ops.Bootstrap]]
  * thresholds, one spelling).
  */
object PoissonDraw {
  /** Partial sums of e⁻¹/k! on the 1e6 grid — THE [[graft.ops
    * .Bootstrap]] thresholds, referenced (not copied) so a retune
    * there moves every draw spelling together. */
  val Thresholds: Array[Long] = graft.ops.Bootstrap.CdfThresholds.toArray

  /** m = number of thresholds ≤ u (the when-chain's first-k-with-u<t_k
    * else 5). */
  private def mOf(u: Long): Long = {
    var k = 0
    while (k < Thresholds.length && u >= Thresholds(k)) k += 1
    k.toLong
  }

  /** md5 draws over the row id's STRING form. Called from codegen. */
  def md5Draws(id: UTF8String, b: Int): ArrayData = {
    val idBytes = id.getBytes
    val out = new Array[Long](b)
    var i = 0
    while (i < b) {
      val bs = java.lang.Integer.toString(i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val buf = new Array[Byte](idBytes.length + 1 + bs.length)
      System.arraycopy(idBytes, 0, buf, 0, idBytes.length)
      buf(idBytes.length) = ':'
      System.arraycopy(bs, 0, buf, idBytes.length + 1, bs.length)
      out(i) = mOf(Md5Prefix.prefixLong(buf, 6) % 1000000L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `poisson_draws(id, b)` — array<bigint> of the B md5-drawn
  * multiplicities. The id must already be STRING (the concat_ws cast
  * the exploded spelling applied, hoisted by the caller). */
case class PoissonDraws(child: Expression, b: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (b >= 1 && child.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poisson_draws expects (string id, b >= 1), got " +
        s"(${child.dataType.simpleString}, $b)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PoissonDraw.md5Draws(input.asInstanceOf[UTF8String], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PoissonDraw.md5Draws($c, $b);")

  override protected def withNewChildInternal(
      newChild: Expression): PoissonDraws = copy(child = newChild)
}

object PoissonDraws {
  private val builder: Seq[Expression] => Expression = es =>
    PoissonDraws(es.head, GramHashes.lit(es(1), "poisson_draws b"))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poisson_draws", builder, "scala_udf")

  def apply(c: org.apache.spark.sql.Column,
      b: Int): org.apache.spark.sql.Column = {
    register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function("poisson_draws", c,
      org.apache.spark.sql.functions.lit(b))
  }
}
