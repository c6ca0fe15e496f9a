package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch as a typed `Aggregator`: approximate frequency
  * for EVERY key (not just the heavy ones — that's [[HeavyHittersAgg]])
  * in O(width × depth) memory per group. Rows of counters merge by
  * element-wise addition, so partial buffers combine associatively and
  * the shuffle carries fixed-size integer grids regardless of the key
  * universe. Query answers `min_d counts(d, h_d(key))`, which
  * never undercounts and overcounts by at most εn
  * (ε = e/width) with probability 1 − δ (δ = e^−depth) — the
  * one-sided bound the spec pins.
  *
  * Hashing: xxhash64 of (seed=depth-row, key) reduced mod width — the
  * same public hash family the engine's dedup paths shuffle on, and
  * deterministic across runs/partitionings.
  */
object CountMinAgg {

  case class Item(item: String)

  /** Buffer/result: depth×width counts flattened row-major. */
  class CountMin(width: Int, depth: Int)
      extends Aggregator[Item, Array[Long], Array[Long]] {
    require(width > 0 && depth > 0)

    protected def slot(d: Int, key: String): Int = {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        org.apache.spark.sql.types.StringType, d.toLong)
      d * width + java.lang.Math.floorMod(h, width.toLong).toInt
    }

    override def zero: Array[Long] = new Array[Long](width * depth)

    override def reduce(buf: Array[Long], in: Item): Array[Long] = {
      var d = 0
      while (d < depth) { buf(slot(d, in.item)) += 1L; d += 1 }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Point query against a finished sketch (driver/test side). */
  def estimate(sketch: Array[Long], width: Int, depth: Int,
      key: String): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        org.apache.spark.sql.types.StringType, d.toLong)
      val c = sketch(d * width + java.lang.Math.floorMod(h, width.toLong).toInt)
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** UDAF form: `countMin(256, 4)(col("item"))`. */
  def countMin(width: Int, depth: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CountMin(width, depth), Encoders.product[Item])

  /** 60-bit-md5 slot — the repo's cross-engine hash currency
    * (`conv(substring(md5("d:key"),1,15),16,10) mod width`, ≡ DuckDB
    * `CAST('0x' || substr(md5(..),1,15) AS BIGINT) % width`). The
    * value is 60-bit non-negative, so plain % is already floorMod. */
  private[graft] def md5Slot(d: Int, key: String, width: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"$d:$key".getBytes("UTF-8"))
    val hex = dig.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  /** [[CountMin]] with the md5 hash family instead of xxhash64 — the
    * oracle twin: every cell is Σ counts of colliding keys, so the
    * whole sketch (and any point query) has an exact DuckDB spelling.
    * xxhash64 stays the deployment path (~25× cheaper per row). */
  class CountMinMd5(width: Int, depth: Int)
      extends CountMin(width, depth) {
    override protected def slot(d: Int, key: String): Int =
      d * width + md5Slot(d, key, width)
  }

  /** UDAF form of the md5-hashed oracle twin. */
  def countMinMd5(width: Int, depth: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CountMinMd5(width, depth), Encoders.product[Item])
}
