package graft.streaming

import graft.ops.Freq
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Bounded-stream processing (HW3 St1/St2/St4, `HWK_3/G029HW3.py`):
  * process exactly the first n items of a stream in arrival order
  * through exact-histogram + reservoir + sticky state, then stop.
  *
  * The reference consumes a socket DStream with 0.01 s micro-batches,
  * keeps all state on the driver, counts items until n, then stops the
  * context gracefully (`HWK_3/G029HW3.py:32-66,99-114`). Here the same
  * contract runs on Structured Streaming `foreachBatch`:
  *  - any streaming DataFrame with columns `ord` (arrival order) and
  *    `item` works — file source over parquet chunks (tested), socket
  *    (`format("socket")` + cast), or rate source;
  *  - St4 truncation-to-n ("take(remaining)") keeps the FIRST
  *    `remaining` items of a batch by `ord` — deterministic, unlike
  *    the reference's partition-order `take` (SURVEY.md §2.5 T4);
  *  - St2 bounded trigger: with `Trigger.AvailableNow` the query
  *    drains the source and stops; the n-cap is enforced per batch.
  *
  * This runner intentionally mirrors the reference's driver-resident
  * state (it IS the parity surface for golden outputs). The scalable
  * equivalents of its three algorithms are the distributed
  * formulations in [[graft.ops.Freq]] — same results distributionally,
  * no driver state.
  */
object Bounded {

  /** Mutable driver state — the Structured-Streaming analogue of the
    * reference's closure-shared histogram/reservoir/sticky dicts. */
  final class StreamState(n: Long, m: Int, stickyP: Double, seed: Long) extends Serializable {
    val histogram = scala.collection.mutable.HashMap.empty[Long, Long]
    val reservoir = new scala.collection.mutable.ArrayBuffer[Long](m)
    val sticky    = scala.collection.mutable.HashMap.empty[Long, Long]
    private val rndR = new scala.util.Random(seed)
    private val rndS = new scala.util.Random(seed + 1)
    var seen = 0L

    def remaining: Long = n - seen
    def done: Boolean = seen >= n

    /** Fold one batch (already in arrival order), honoring the n-cap. */
    def update(items: Iterator[Long]): Unit = {
      // clamp before toInt: remaining > Int.MaxValue would wrap
      // negative and take(…) would silently process zero items
      val it = items.take(math.min(math.max(0L, remaining), Int.MaxValue.toLong).toInt)
      it.foreach { x =>
        seen += 1
        histogram.updateWith(x) { c => Some(c.getOrElse(0L) + 1L) }
        // Algorithm R step (HWK_3/G029HW3.py:10-19)
        if (reservoir.length < m) reservoir += x
        else if (rndR.nextDouble() < m.toDouble / seen) reservoir(rndR.nextInt(m)) = x
        // sticky step (HWK_3/G029HW3.py:22-29)
        sticky.get(x) match {
          case Some(c) => sticky(x) = c + 1
          case None    => if (rndS.nextDouble() < stickyP) sticky(x) = 1L
        }
      }
    }

    /** St3: exact frequent items from the full histogram. */
    def exactFrequent(phi: Double): Seq[Long] =
      histogram.collect { case (k, c) if c >= phi * seen => k }.toSeq.sorted
    /** St5 answer: distinct reservoir items, sorted. */
    def reservoirItems: Seq[Long] = reservoir.toSeq.distinct.sorted
    /** St6 answer: sticky items with cnt ≥ (φ−ε)·n. */
    def stickyFrequent(phi: Double, eps: Double): Seq[Long] =
      sticky.collect { case (k, c) if c >= (phi - eps) * seen => k }.toSeq.sorted
  }

  /** Run the bounded pipeline over a streaming `ord, item` DataFrame.
    * Returns the final state after the source is drained or n reached. */
  def run(stream: DataFrame, n: Long, m: Int, stickyP: Double, seed: Long,
          checkpointDir: String): StreamState = {
    val state = new StreamState(n, m, stickyP, seed)
    val query = stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        if (!state.done) {
          // order within the batch is the arrival order (St4): sort by
          // ord and keep at most `remaining` — executors only sort and
          // ship ≤ remaining rows, state mutation stays on the driver
          val batch = df.orderBy("ord").limit(
            math.min(state.remaining, Int.MaxValue.toLong).toInt)
            .select(col("item").cast("long"))
            .collect().iterator.map(_.getLong(0))
          state.update(batch)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    state
  }

  /** File-source stream over parquet chunk files (the offline twin of
    * the reference's socket: one chunk per micro-batch, in file order). */
  def fileStream(spark: SparkSession, dir: String,
                 schemaDDL: String = "ord BIGINT, item BIGINT"): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(dir)

  /** S2 — live socket source (the reference's
    * `ssc.socketTextStream(host, port)`, `HWK_3/G029HW3.py:103`):
    * one integer per line. No ordering column exists on a socket — the
    * arrival order is the TCP byte order, exactly like the reference. */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()
      .select(col("value").cast("long").as("item"))

  /** Run the bounded pipeline over an UNORDERED streaming `item`
    * DataFrame (socket). The query is stopped from a monitor loop once
    * n items are seen — the reference's Event.wait + graceful stop
    * (St2, `HWK_3/G029HW3.py:111-114`). Within-batch order follows the
    * source's partition layout (the socket source round-robins rows
    * over partitions), exactly as nondeterministic as the reference's
    * `batch.take(remaining)` over a partitioned RDD (SURVEY.md §2.5
    * T4); item MULTISETS are exact, order-sensitive state is
    * distribution-level. Use [[run]] with an `ord` column when the
    * source carries arrival order. */
  def runUnordered(stream: DataFrame, n: Long, m: Int, stickyP: Double, seed: Long,
                   checkpointDir: String): StreamState = {
    val state = new StreamState(n, m, stickyP, seed)
    val query = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!state.done)
          state.update(df.collect().iterator.map(_.getLong(0)))
      }
      .option("checkpointLocation", checkpointDir)
      .start()
    while (!state.done && query.isActive) Thread.sleep(50)
    query.stop()
    query.awaitTermination()
    state
  }

  /** Batch twin: the same fold over a static ordered DataFrame —
    * used by golden/parity tests and the DuckDB-checkable surface. */
  def batchTwin(items: DataFrame, n: Long, m: Int, stickyP: Double, seed: Long): StreamState = {
    val state = new StreamState(n, m, stickyP, seed)
    state.update(items.orderBy("ord").limit(math.min(n, Int.MaxValue.toLong).toInt)
      .select(col("item").cast("long"))
      .collect().iterator.map(_.getLong(0)))
    state
  }
}
