package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k selection as a typed Catalyst [[Aggregator]]: keeps
  * the k best `(nn_id, cos)` pairs under the total order
  * (cos desc, nn_id asc) — EXACTLY the pairs a
  * `row_number over (partition by query order by cos desc, nn_id)`
  * window keeps at rank ≤ k, but as a mergeable aggregate.
  *
  * Why it exists: a rank window must SHUFFLE AND SORT every candidate
  * row (an ANN rerank shortlist over N·nprobe·occupancy candidates —
  * measured 78 s at the 10× scaling fixture); this buffer is ≤ k
  * entries, `ObjectHashAggregate` runs it map-side, so only
  * queries × k rows cross the wire (measured 8 s on the same fixture,
  * byte-identical answers). The selection is deterministic — a total
  * order admits exactly one top-k set — so swapping the window for
  * the aggregate changes no results, which `NativeFunctionsSpec` pins
  * on planted ties.
  *
  * `reduce` replaces the current worst only when the new pair beats
  * it (k is rerank-sized — tens — so the linear worst scan beats heap
  * constants); `merge` concatenates and re-selects. Buffer entries
  * are parallel arrays (an `Encoders.product` of primitive arrays —
  * no per-entry object row).
  */
class TopKByCosAgg(k: Int)
    extends Aggregator[(Long, Double), TopKByCosAgg.Buf, Seq[TopKByCosAgg.Ent]] {
  require(k >= 1, s"k must be >= 1, got $k")
  import TopKByCosAgg.{Buf, Ent, beats}

  override def zero: Buf = Buf(Array.emptyLongArray, Array.emptyDoubleArray)

  override def reduce(b: Buf, x: (Long, Double)): Buf = {
    val (id, cos) = x
    val n = b.ids.length
    if (n < k) Buf(b.ids :+ id, b.cos :+ cos)
    else {
      // index of the WORST kept entry (lowest cos; highest id on ties)
      var w = 0
      var i = 1
      while (i < n) {
        if (beats(b.cos(w), b.ids(w), b.cos(i), b.ids(i))) w = i
        i += 1
      }
      if (beats(cos, id, b.cos(w), b.ids(w))) {
        val ids = b.ids.clone(); val cs = b.cos.clone()
        ids(w) = id; cs(w) = cos
        Buf(ids, cs)
      } else b
    }
  }

  // sortWith(beats), NOT sortBy((-c, id)): Scala's Double
  // TotalOrdering distinguishes −0.0 from 0.0, which `beats` (and
  // Spark's sort after NormalizeFloatingNumbers) treat as equal —
  // mixing the two orders makes the kept set partitioning-dependent
  // on ±0.0 ties
  override def merge(a: Buf, b: Buf): Buf = {
    if (b.ids.isEmpty) return a
    if (a.ids.isEmpty) return b
    val all = (a.ids.zip(a.cos) ++ b.ids.zip(b.cos))
      .sortWith { case ((iA, cA), (iB, cB)) => beats(cA, iA, cB, iB) }
      .take(k)
    Buf(all.map(_._1), all.map(_._2))
  }

  override def finish(b: Buf): Seq[Ent] =
    b.ids.zip(b.cos)
      .sortWith { case ((iA, cA), (iB, cB)) => beats(cA, iA, cB, iB) }
      .map { case (id, c) => Ent(id, c) }.toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Ent]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ent]]()
}

object TopKByCosAgg {
  case class Buf(ids: Array[Long], cos: Array[Double])
  case class Ent(nn_id: Long, cos: Double)

  /** True iff (cosA, idA) ranks STRICTLY better than (cosB, idB)
    * under (cos desc, nn_id asc). */
  def beats(cosA: Double, idA: Long, cosB: Double, idB: Long): Boolean =
    cosA > cosB || (cosA == cosB && idA < idB)
}
