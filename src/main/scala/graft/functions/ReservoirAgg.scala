package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed reservoir sampling as a typed Catalyst [[Aggregator]] —
  * the custom-aggregate surface of SURVEY.md §7.3 (St5).
  *
  * Buffer = (items seen, current sample). `reduce` is textbook
  * Algorithm R; `merge` draws each merged slot from side a with
  * probability nₐ/(nₐ+n_b), without replacement within each side —
  * the standard near-uniform reservoir union. RNG is seeded from
  * (seed, counts) so a given
  * partitioning is reproducible; across different partitionings the
  * result is distributionally uniform (the documented contract for
  * order-free sampling — `HWK_3/G029HW3.py:10-19` is order-dependent
  * and driver-resident; this is its shuffle-free distributed twin).
  */
class ReservoirAgg(m: Int, seed: Long)
    extends Aggregator[Long, ReservoirAgg.Buf, Array[Long]] {
  import ReservoirAgg.Buf

  override def zero: Buf = Buf(0L, Vector.empty)

  override def reduce(b: Buf, x: Long): Buf = {
    val n = b.n + 1
    if (b.sample.length < m) Buf(n, b.sample :+ x)
    else {
      val r = rng(n)
      if (r.nextDouble() < m.toDouble / n) Buf(n, b.sample.updated(r.nextInt(m), x))
      else Buf(n, b.sample)
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val n = a.n + b.n
    val r = rng(n ^ (a.n << 20))
    val target = math.min(m.toLong, n).toInt
    // per-slot side choice ∝ side mass, drawing without replacement
    // from each side's (shuffled) sample pool
    val aPool = r.shuffle(a.sample).iterator.buffered
    val bPool = r.shuffle(b.sample).iterator.buffered
    val out = Vector.newBuilder[Long]
    var k = 0
    while (k < target) {
      val pickA = (r.nextDouble() < a.n.toDouble / n && aPool.hasNext) || !bPool.hasNext
      out += (if (pickA) aPool.next() else bPool.next())
      k += 1
    }
    Buf(n, out.result())
  }

  override def finish(b: Buf): Array[Long] = b.sample.toArray

  private def rng(mix: Long) = new scala.util.Random(seed ^ mix * 0x9E3779B97F4A7C15L)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object ReservoirAgg {
  case class Buf(n: Long, sample: Vector[Long])
}
