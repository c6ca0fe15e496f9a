package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Distributed Bloom-filter build as a typed [[Aggregator]]: each task
  * fills a partial filter from its partition's long hashes, partials
  * OR-merge associatively (bit-union), and the finished sketch
  * serializes to bytes. One pass over the reference corpus, partial
  * aggregation on the map side, and the result is a single
  * `m = -n·ln(p)/ln(2)²`-bit array — the membership index that lets an
  * incremental-dedup job test "is this doc in the 100 TB reference?"
  * with zero joins and no false negatives (see
  * [[graft.text.IncrementalDedup]]).
  *
  * Spark's own `org.apache.spark.util.sketch.BloomFilter` supplies the
  * bit array + hashing (the same sketch the engine's runtime filters
  * use), so serialization is stable and `mightContainLong` is cheap.
  */
class BloomFilterAgg(expectedItems: Long, fpp: Double = 0.01)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, h: Long): BloomFilter = {
    b.putLong(h); b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomFilterAgg {
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
