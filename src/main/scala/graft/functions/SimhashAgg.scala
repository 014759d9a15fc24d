package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash vote accumulation as a typed [[Aggregator]] over token
  * hashes: buffer = 64 bit-vote counters, finish = packed sign bits.
  *
  * Equivalent to 64 separate `sum(when(bit,1,-1))` aggregates but one
  * expression: a single mutable int-array buffer updated in a tight
  * JVM loop (ObjectHashAggregate), ~64x less aggregate-expression
  * bookkeeping per row and far cheaper codegen compilation. */
class SimhashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(votes: Array[Int], h: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(votes: Array[Int]): Long = {
    var sig = 0L; var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
