package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator`) computing a k-permutation MinHash signature
  * over a group of 60-bit shingle hashes — the aggregation form of
  * [[graft.operators.DedupQueries.d7MinhashSig]] for data that arrives
  * EXPLODED (one row per shingle), e.g. after a generator/flatMap stage or
  * when shingling happens upstream of a shuffle.
  *
  * Buffer = the running per-permutation minima (k longs). Merge is
  * element-wise min, so the aggregate is map-side combinable: each partition
  * ships exactly k longs per group regardless of group size — the property
  * that makes MinHash-over-groupBy viable at 100 TB.
  *
  * Permutations h_i(x) = (a_i * (x mod P) + b_i) mod P share constants with
  * the column-expression implementation so both paths produce identical
  * signatures.
  */
class MinHashAgg(perms: Seq[(Int, Int)]) extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val P = 1000000007L

  override def zero: Array[Long] = Array.fill(perms.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    val xm = ((x % P) + P) % P
    while (i < perms.length) {
      val (a, b) = perms(i)
      val h = (a * xm + b) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
    var i = 0
    while (i < l.length) { if (r(i) < l(i)) l(i) = r(i); i += 1 }
    l
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  // encoders built once per aggregator instance, not per call — encoder
  // construction resolves + code-generates serializers, which dominated the
  // first run of the whole UDAF path when rebuilt per task
  private val bufEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  private val outEnc: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def bufferEncoder: Encoder[Array[Long]] = bufEnc
  override def outputEncoder: Encoder[Seq[Long]] = outEnc
}

object MinHashAgg {
  /** Default instance sharing constants with DedupQueries.MinhashPerms. */
  def default: MinHashAgg =
    new MinHashAgg(graft.operators.DedupQueries.MinhashPerms)
}
