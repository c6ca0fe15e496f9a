package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `len−k+1` Rabin-Karp rolling hashes
  * of a string's k-char grams as one `array<bigint>` — the position
  * table of [[graft.text.SubstringDedup]] built INSIDE whole-stage
  * codegen. `posexplode(rolling_hash_grams(text, k))` replaces the
  * typed `flatMap` kernel, eliminating the object-encoder boundary
  * (DeserializeToObject → MapPartitions → SerializeFromObject) that
  * used to split the scan stage: the scan, hash loop, and explode now
  * fuse into one Tungsten stage.
  *
  * Identical algorithm and constants to the former Scala kernel (base
  * 1000003, wrapping-Long polynomial over UTF-16 code units, O(len)
  * per row), so hash values — and therefore every downstream gate —
  * are unchanged. Strings shorter than k yield an empty array (and so
  * vanish under posexplode). 4th native expression of the §2.9
  * surface; the (b) tier of the custom-operator preference order.
  */
case class RollingHashGrams(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_grams expects (string, k >= 1), got " +
        s"(${child.dataType.simpleString}, $k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private[functions] def hashes(s: String): Array[Long] = {
    val n = s.length
    if (n < k) return Array.emptyLongArray
    val B = 1000003L
    var bk = 1L
    var h = 0L
    var i = 0
    while (i < k) {
      h = h * B + s.charAt(i)
      if (i < k - 1) bk *= B
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    out(0) = h
    var p = 1
    while (p <= n - k) {
      h = (h - s.charAt(p - 1) * bk) * B + s.charAt(p + k - 1)
      out(p) = h
      p += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(hashes(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val bk = ctx.freshName("bk")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |long[] $out;
         |if ($n < $k) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[$n - $k + 1];
         |  long $bk = 1L;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    $h = $h * 1000003L + $s.charAt($i);
         |    if ($i < $k - 1) $bk *= 1000003L;
         |  }
         |  $out[0] = $h;
         |  for (int $p = 1; $p <= $n - $k; $p++) {
         |    $h = ($h - $s.charAt($p - 1) * $bk) * 1000003L
         |         + $s.charAt($p + $k - 1);
         |    $out[$p] = $h;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashGrams = copy(child = newChild)
}

object RollingHashGrams {
  private def build(exprs: Seq[Expression]): RollingHashGrams = {
    val k = exprs(1).eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => sys.error(s"rolling_hash_grams k must be an int literal, got $other")
    }
    RollingHashGrams(exprs.head, k)
  }

  /** Register `rolling_hash_grams(text, k)` (k a foldable int literal)
    * in the session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash_grams", build, "scala_udf")
}
