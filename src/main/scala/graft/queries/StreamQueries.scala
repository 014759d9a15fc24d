package graft.queries

import graft.streaming.Bounded
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-stream queries (SURVEY.md §2.7 St1–St6) exposed on the
  * batch-twin surface: the same driver-state fold the streaming runner
  * uses (foreachBatch), applied to the first N events by arrival order.
  * The exact-histogram part is DuckDB-checkable; the sampled state is
  * seeded and rows-only (streaming==batch parity is pinned by
  * BoundedStreamSpec).
  */
object StreamQueries extends QueryPack {
  private val N = 5000L
  private val M = 20
  private val P = 0.05
  private val SEED = 42L

  private def state(s: SparkSession, d: String) = {
    val items = Tables.events(s, d)
      .select(col("event_id").as("ord"), col("user_id").as("item"))
    Bounded.batchTwin(items, N, M, P, SEED)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // St1/St2/St4 + A7: exact histogram of the first-N prefix
    "stream_hist_prefix" -> ((s, d) => {
      import s.implicits._
      state(s, d).histogram.toSeq.toDF("item", "cnt")
    }),
    // St5 state after the bounded run (seeded Algorithm R)
    "stream_reservoir" -> ((s, d) => {
      import s.implicits._
      state(s, d).reservoirItems.toDF("item")
    }),
    // St6 estimated-frequent answer on the prefix
    "stream_sticky" -> ((s, d) => {
      import s.implicits._
      state(s, d).stickyFrequent(0.008, 0.004).toDF("item")
    }),
    // Streaming stateful dedup, exercised through its batch twin:
    // flatMapGroupsWithState over a batch Dataset runs the SAME
    // operator code with each key's rows as one group, so first-arrival
    // = min(id) per key — SQL-expressible, unlike the incremental
    // streaming run (which StatefulDedupSpec pins to this twin).
    "dedup_first_seen" -> ((s, d) =>
      graft.streaming.StatefulDedup.firstArrivals(
        Tables.events(s, d)
          .select(col("user_id").as("key"), col("event_id").as("id")))
        .toDF()),
  )

  override def oracles: Map[String, String] = Map(
    "stream_hist_prefix" ->
      s"""SELECT user_id AS item, count(*) AS cnt
         |FROM (SELECT user_id FROM events ORDER BY event_id LIMIT $N)
         |GROUP BY 1""".stripMargin,
    "dedup_first_seen" ->
      """SELECT user_id AS key, min(event_id) AS first_id
        |FROM events GROUP BY 1""".stripMargin,
  )
}
