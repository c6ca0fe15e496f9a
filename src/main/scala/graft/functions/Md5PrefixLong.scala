package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused spelling of the cross-engine md5-uniform draw (r15
  * optimization): `md5_prefix_long(x, digits)` ≡
  * `CAST(conv(substring(md5(x), 1, digits), 16, 10) AS BIGINT)` —
  * the value of the digest's first `digits` hex nibbles — computed as
  * ONE digest + an integer nibble fold, with none of the hex-encode /
  * substring / radix-parse string allocations of the conv chain
  * (guide §1.2 step 2: per-task work, after the plan shape is right).
  *
  * The md5-derived integer is the repo's one reproducible-on-any-
  * engine uniform (Bootstrap draws, DSIR Gumbel keys, block
  * checksums, weighted sampling); the DuckDB oracle mirrors keep the
  * conv spelling — this expression only changes how the SAME value is
  * computed on the Spark side. `digits` ≤ 15 keeps the value in 60
  * bits (conv parity: non-negative long).
  *
  * The kernel is a static method shared by the interpreted and
  * generated paths (the [[GramHash]] convention, so they cannot
  * diverge); MessageDigest instances are thread-local (MD5 digests
  * are stateful and tasks share a JVM).
  */
object Md5Prefix {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of the first `digits` hex nibbles of md5(bytes). */
  def prefixLong(bytes: Array[Byte], digits: Int): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < digits) {
      val b = dig(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  def prefixLong(s: UTF8String, digits: Int): Long =
    prefixLong(s.getBytes, digits)
}

/** `md5_prefix_long(child, digits)` over a string or binary child —
  * see [[Md5Prefix]]. */
case class Md5PrefixLong(child: Expression, digits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((child.dataType == StringType || child.dataType == BinaryType)
        && digits >= 1 && digits <= 15)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long expects (string|binary, 1 <= digits <= 15), " +
        s"got (${child.dataType.simpleString}, $digits)")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      Md5Prefix.prefixLong(input.asInstanceOf[UTF8String], digits)
    case _ =>
      Md5Prefix.prefixLong(input.asInstanceOf[Array[Byte]], digits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix.prefixLong($c, $digits);")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLong = copy(child = newChild)
}

object Md5PrefixLong {
  private val builder: Seq[Expression] => Expression = es =>
    Md5PrefixLong(es.head, GramHashes.lit(es(1), "md5_prefix_long digits"))

  /** Register `md5_prefix_long(x, digits)` in the session's function
    * registry (the [[GramHashes.register]] convention). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix_long", builder, "scala_udf")

  /** Column face — drop-in for
    * `conv(substring(md5(x), 1, digits), 16, 10).cast("long")`.
    * Registers on the active session. */
  def apply(c: Column, digits: Int): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function(
      "md5_prefix_long", c, org.apache.spark.sql.functions.lit(digits))
  }
}
