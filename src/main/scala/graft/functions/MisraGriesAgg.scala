package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Misra-Gries heavy-hitters sketch as a typed Catalyst
  * [[Aggregator]] — the bounded-memory scale path for frequent items
  * next to the exact histogram (St3) and the sampling estimators
  * (St5/St6): k counters summarize any stream with a PROVABLE
  * per-item error bound, and two summaries merge losslessly
  * w.r.t. that bound (Agarwal et al., "Mergeable Summaries", PODS'12
  * — the merge keeps the top-k counters after subtracting the
  * (k+1)-th largest).
  *
  * The buffer tracks its own error budget `d` (total decrement mass),
  * giving machine-checkable laws the invariant gate verifies against
  * the exact histogram:
  *   est(x) ≤ true(x) ≤ est(x) + d          for items in the summary,
  *   true(x) ≤ d                            for items absent from it,
  *   d ≤ n / (k+1)                          (the MG space guarantee).
  *
  * Deterministic given a partitioning (no RNG); across different
  * partitionings the VALUES may differ but the laws cannot — which is
  * why the driver gate checks laws, not values (same contract as the
  * distributed reservoir).
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[Long, MisraGriesAgg.Buf, Array[MisraGriesAgg.Entry]] {
  import MisraGriesAgg.{Buf, Entry}
  require(k >= 1, "need at least one counter")

  override def zero: Buf = Buf(0L, 0L, Map.empty)

  override def reduce(b: Buf, x: Long): Buf = {
    val n = b.n + 1
    b.items.get(x) match {
      case Some(c) => b.copy(n = n, items = b.items.updated(x, c + 1))
      case None if b.items.size < k => b.copy(n = n, items = b.items.updated(x, 1L))
      case None =>
        // classic MG step: x's +1 cancels against the global −1, so
        // decrement every counter, drop zeros, and absorb one unit
        // of error
        val dec = b.items.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        Buf(n, b.d + 1, dec)
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val sum = (a.items.keySet ++ b.items.keySet).iterator
      .map(i => i -> (a.items.getOrElse(i, 0L) + b.items.getOrElse(i, 0L)))
      .toMap
    if (sum.size <= k) Buf(a.n + b.n, a.d + b.d, sum)
    else {
      // subtract the (k+1)-th largest count from everything — the
      // mergeable-summaries rule that preserves d ≤ n/(k+1)
      val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val kept = sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      Buf(a.n + b.n, a.d + b.d + cut, kept)
    }
  }

  override def finish(b: Buf): Array[Entry] =
    b.items.toArray.sortBy(_._1).map { case (i, c) => Entry(i, c, b.d, b.n) }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Entry]]()
}

object MisraGriesAgg {
  case class Buf(n: Long, d: Long, items: Map[Long, Long])
  /** err/n ride on every row so the exploded relational face is
    * self-contained. */
  case class Entry(item: Long, est: Long, err: Long, n: Long)
}
