package graft.queries

import graft.ops.Freq
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries for the HW3 frequent-items surface (SURVEY.md §2: A7, St3,
  * J4, St5, St6) over the `events` table: item = user_id, arrival
  * order = event_id.
  */
object FreqQueries extends QueryPack {
  private val PHI  = 0.0075
  private val EPS  = 0.0025
  private val SEED = 42L

  /** events as an ordered item stream: `ord, item`. */
  private def items(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_id").as("ord"), col("user_id").as("item"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7: exact histogram
    "freq_hist" -> ((s, d) => Freq.histogram(items(s, d))),
    // St3: exact frequent items (cnt >= phi*n)
    "freq_exact" -> ((s, d) => Freq.frequentItems(items(s, d), PHI)),
    // T3-ish: top-20 heaviest items, deterministic order
    "freq_topk" -> ((s, d) =>
      Freq.histogram(items(s, d)).orderBy(col("cnt").desc, col("item")).limit(20)),
    // J4: items frequent at phi-eps annotated against frequent at phi
    "freq_annotated" -> ((s, d) => {
      val it = items(s, d)
      Freq.annotate(Freq.frequentItems(it, PHI - EPS), Freq.frequentItems(it, PHI)
        ).select("item", "cnt", "is_true")
    }),
    // St5: seeded distributed reservoir (m = ceil(1/phi) capped small)
    "freq_reservoir" -> ((s, d) =>
      Freq.reservoirSample(items(s, d), 50, SEED)),
    // skew path: salted two-stage aggregation — same result as the
    // direct groupBy (same oracle as freq_hist), hot keys split 16 ways
    "freq_hist_salted" -> ((s, d) =>
      graft.ops.Skew.saltedCount(items(s, d), "item", salts = 16)),
    // St6: seeded distributed sticky table + final threshold
    "freq_sticky" -> ((s, d) => {
      val it = items(s, d)
      val n = it.count()
      val p = math.min(1.0, Freq.stickyRate(PHI, EPS, 0.1) / n)
      Freq.stickyFrequent(Freq.stickySample(it, p, SEED), PHI, EPS, n)
    }),
    // GROUPED heavy hitters: one Misra-Gries summary per key (the
    // "top users per event type" / "top tokens per language" shape a
    // training pipeline asks constantly) — the typed Aggregator lifts
    // into untyped groupBy via functions.udaf, so per-key sketches
    // cost one shuffle on the group key. Laws per group verified by
    // check_spacesaving_grouped.
    "freq_spacesaving_by_type" -> ((s, d) => {
      val mg = udaf(new graft.functions.MisraGriesAgg(16))
      Tables.events(s, d)
        .select(col("event_type"), col("user_id"))
        .repartition(s.sparkContext.defaultParallelism)
        .groupBy("event_type")
        .agg(mg(col("user_id")).as("mg"))
        .select(col("event_type"), explode(col("mg")).as("e"))
        .select(col("event_type"), col("e.item"), col("e.est"),
          col("e.err"), col("e.n"))
    }),
    // Misra-Gries mergeable heavy-hitters sketch (bounded memory, no
    // RNG): item, undercount estimate, tracked error bound. Values
    // are partitioning-dependent → laws verified by
    // check_spacesaving, not a value oracle.
    "freq_spacesaving" -> ((s, d) => {
      import s.implicits._
      // fan the single-file scan out so the sketch's MERGE path (the
      // distributed story) runs in production, not just in tests
      val it = items(s, d).select(col("item"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
      it.select(new graft.functions.MisraGriesAgg(64).toColumn.name("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.item"), col("e.est"), col("e.err"), col("e.n"))
    }),
  )

  override def oracles: Map[String, String] = Map(
    "freq_hist" ->
      "SELECT user_id AS item, count(*) AS cnt FROM events GROUP BY 1",
    // salted aggregation must equal the direct groupBy
    "freq_hist_salted" ->
      "SELECT user_id AS item, count(*) AS cnt FROM events GROUP BY 1",
    "freq_exact" ->
      s"""SELECT user_id AS item, count(*) AS cnt FROM events GROUP BY 1
         |HAVING count(*) >= $PHI * (SELECT count(*) FROM events)""".stripMargin,
    "freq_topk" ->
      """SELECT user_id AS item, count(*) AS cnt FROM events GROUP BY 1
        |ORDER BY cnt DESC, item LIMIT 20""".stripMargin,
    "freq_annotated" ->
      s"""WITH hist AS (SELECT user_id AS item, count(*) AS cnt FROM events GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM events)
         |SELECT h.item, h.cnt,
         |       (h.cnt >= $PHI * (SELECT n FROM n)) AS is_true
         |FROM hist h
         |WHERE h.cnt >= ${PHI - EPS} * (SELECT n FROM n)""".stripMargin,
  )
}
