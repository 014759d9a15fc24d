package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded merge of per-list top-k arrays ([[PqAdcTopK]] outputs —
  * each already sorted by (cos desc, nn_id asc)): keeps the k best
  * entries across a query's `nprobe` probed lists. The input rows are
  * ONE PER (query, list) — nprobe per query, not one per candidate —
  * so the per-row typed-aggregator overhead that rules
  * [[TopKByCosAgg]] out of the IVFADC hot path (one call per
  * CANDIDATE) is irrelevant here, and with the probe stream hash-
  * partitioned by query id the groupBy needs no shuffle at all.
  * `reduce`/`merge` are the textbook two-pointer sorted-array merge,
  * truncated at k. */
class MergeTopKAgg(k: Int)
    extends Aggregator[Seq[TopKByCosAgg.Ent], Seq[TopKByCosAgg.Ent], Seq[TopKByCosAgg.Ent]] {
  require(k >= 1, s"k must be >= 1, got $k")
  import TopKByCosAgg.{Ent, beats}

  override def zero: Seq[Ent] = Seq.empty

  private def mergeSorted(a: Seq[Ent], b: Seq[Ent]): Seq[Ent] = {
    if (a.isEmpty) return b.take(k)
    if (b.isEmpty) return a.take(k)
    val out = Vector.newBuilder[Ent]
    var i = 0; var j = 0; var taken = 0
    while (taken < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length &&
        beats(a(i).cos, a(i).nn_id, b(j).cos, b(j).nn_id))
      out += (if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) })
      taken += 1
    }
    out.result()
  }

  override def reduce(buf: Seq[Ent], x: Seq[Ent]): Seq[Ent] = mergeSorted(buf, x)
  override def merge(a: Seq[Ent], b: Seq[Ent]): Seq[Ent] = mergeSorted(a, b)
  override def finish(r: Seq[Ent]): Seq[Ent] = r

  override def bufferEncoder: Encoder[Seq[Ent]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ent]]()
  override def outputEncoder: Encoder[Seq[Ent]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ent]]()
}
