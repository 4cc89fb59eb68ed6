package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.functions.Hashing

/** Typed MinHash aggregator — the custom-aggregate form of the HOF
  * signature in [[NearDup.minhashSignature]], for when tokens arrive as
  * ROWS (exploded corpora, streaming updates) instead of per-document
  * arrays. Input is the pre-computed h32 of an element; the buffer is the
  * K running minima of the universal-hash family (same mix constants as
  * the HOF/oracle path, so signatures are interchangeable).
  *
  * Buffer is K longs — constant size, merge is elementwise min, so the
  * aggregation is fully map-side combinable and works under
  * partial/final aggregation and streaming state alike.
  */
class MinHashAgg(numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val consts: Array[(Long, Long)] =
    (0 until numHashes).map(Hashing.mixConsts).toArray

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val (a, b) = consts(i)
      val v = (h * a + b) % Hashing.MinhashPrime
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (y(i) < x(i)) x(i) = y(i)
      i += 1
    }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
