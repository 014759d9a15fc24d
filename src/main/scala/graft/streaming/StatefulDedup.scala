package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication with keyed state — the stateful
  * operator a continuous training-data ingest needs: emit each content
  * key the FIRST time it is seen, drop all later arrivals.
  *
  * Built on `KeyValueGroupedDataset.flatMapGroupsWithState`: state =
  * one boolean per key, partitioned by the state store (scales with
  * keys across executors; at 100 TB the key is a content digest, so
  * state is #distinct-documents booleans sharded over the cluster —
  * never a driver structure). Timeout-free here; production would set
  * a TTL via `GroupStateTimeout.ProcessingTimeTimeout` to bound state.
  */
object StatefulDedup {

  case class Seen(seen: Boolean)
  case class FirstSeen(key: Long, first_id: Long)

  /** Streaming: one output row per distinct `key` (first arrival, by
    * batch order), keyed state remembers the rest. Input columns:
    * `key` (digest/hash), `id` (row id). */
  def firstArrivals(stream: DataFrame): Dataset[FirstSeen] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("key").cast("long"), col("id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[Seen]) =>
          if (state.exists && state.get.seen) Iterator.empty
          else {
            state.update(Seen(true))
            val firstId = rows.map(_._2).min
            Iterator.single(FirstSeen(key, firstId))
          }
      }
  }
}
