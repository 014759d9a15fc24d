package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational breadth of the engine (SURVEY.md §2.8: capabilities the
  * reference lacks but a complete engine ships "for free" on Spark
  * SQL): aggregations, equi/semi/anti joins, window functions, set
  * ops, rollup, date functions — all DuckDB-oracle-backed.
  *
  * Float-determinism convention: money sums are computed as
  * `cast(round(x*100) as bigint)` cents so every aggregate is an
  * order-independent exact integer; quantity sums are integral doubles
  * (exact in IEEE up to 2^53). Averages divide two exact values.
  */
object RelationalQueries extends QueryPack {

  private def centsCol(c: String) = round(col(c) * 100).cast("long")

  /** Per-JVM scratch dir for the warehouse roundtrip (overwritten per
    * run, deleted on JVM exit — same contract as CheckQueries'
    * jsonlScratch). */
  private lazy val warehouseScratch: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_warehouse")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () }
    }
    p.toString
  }

  /** events.ts as a TIMESTAMP column regardless of fixture schema:
    * long = nanos-since-epoch (nanosAsLong scan), else native
    * timestamp. The long-vs-timestamp unit assumption lives HERE
    * only — every events query normalizes through this. */
  private def eventTs(ev: org.apache.spark.sql.DataFrame) =
    if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      timestamp_micros(floor(col("ts") / 1000L).cast("long"))
    else col("ts").cast("timestamp")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary
    "tpch_q1" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(centsCol("l_extendedprice")).as("sum_price_cents"),
          count(lit(1)).as("count_order"),
          round(sum("l_quantity") / count(lit(1)), 6).as("avg_qty"))),
    // broadcast equi-join + agg: revenue by market segment
    "join_mktsegment_revenue" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(centsCol("o_totalprice")).as("revenue_cents"))),
    // skew path: salted shuffle join — same result as the plain
    // equi-join (the oracle is the unsalted SQL join), hot probe keys
    // split 16 ways. The fact-side twin of freq_hist_salted.
    "join_events_segment_salted" -> ((s, d) =>
      graft.ops.Skew.saltedJoin(
          Tables.events(s, d), Tables.customer(s, d),
          "user_id", "c_custkey", salts = 16)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          sum(centsCol("value")).as("value_cents"))),
    // 3-way join: order count by part brand and supplier nation
    "join_brand_nation" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("p_brand", "n_name")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))),
    // window: top-3 orders per customer by value
    "window_top_orders" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    }),
    // set op: nations present among both customers and suppliers
    "setop_common_nations" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())),
    // anti join: customers with no recorded events (non-empty at every
    // SF: the events table covers ~10% of customers)
    "anti_customers_no_events" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.events(s, d), col("c_custkey") === col("user_id"), "left_anti")
        .select("c_custkey")),
    // semi join: parts that appear in some lineitem, count by type
    "semi_parts_used" -> ((s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy("p_type").agg(count(lit(1)).as("n"))),
    // rollup: order counts by (status, priority) with subtotals
    "rollup_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))),
    // full grouping-set lattice (rollup's big sibling): all four
    // (status, priority) grouping combinations in one pass — Spark
    // expands the sets map-side, so it is still one shuffle
    "cube_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))),
    // date functions: orders per calendar year
    "orders_by_year" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(centsCol("o_totalprice")).as("revenue_cents"))),
    // pivot (wide reshaping): order counts by year × status as
    // columns. The status list is PINNED — an unpinned pivot scans
    // once just to discover values, and a nondeterministic column
    // set would break every downstream consumer at scale
    "pivot_status_by_year" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P")).count()
        .select(col("yr"), coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))),
    // warehouse layout under the hash gate: write orders as a
    // Hive-partitioned (o_year=…/) parquet layout, read it back
    // through partition discovery, and aggregate a two-year slice —
    // the filter lands in PartitionFilters (directory pruning; the
    // plan shape is pinned by PlanSpec), and the oracle recomputes
    // from the ORIGINAL table, so the roundtrip must preserve every
    // value exactly
    "warehouse_roundtrip" -> ((s, d) => {
      val path = s"$warehouseScratch/orders_by_year"
      graft.sources.Warehouse.writePartitioned(
        Tables.orders(s, d).withColumn("o_year", year(col("o_orderdate"))),
        path, Seq("o_year"))
      graft.sources.Warehouse.readPartitioned(s, path)
        .where(col("o_year") >= 1994 && col("o_year") <= 1995)
        .groupBy(col("o_year").cast("long").as("o_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(centsCol("o_totalprice")).as("revenue_cents"))
    }),
    // sessionization: Spark's session_window (30-min gap) on the
    // batch surface; the oracle is the INDEPENDENT lag+cumsum
    // formulation (new session iff gap ≥ 30 min), all-integer math so
    // the compare is exact. Session starts as truncated epoch seconds.
    "sessionize_events" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tsc = eventTs(ev)
      ev.groupBy(col("user_id"), session_window(tsc, "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(centsCol("value")).as("sum_value_cents"))
        .select(col("user_id"), col("w.start").cast("long").as("session_start"),
          col("n_events"), col("sum_value_cents"))
    }),
    // range join (operator Spark lacks a strategy for — graft.ops.
    // RangeJoin grid bucketization): events binned into OVERLAPPING
    // value bands (each value matches ≤ 2 bands), aggregated per band
    "range_value_bands" -> ((s, d) => {
      val bands = s.range(0, 100)
        .select(col("id").as("band_id"),
          (col("id") * 5.0).as("lo"), (col("id") * 5.0 + 10.0).as("hi"))
      val pts = Tables.events(s, d).select(col("value").as("v"))
      graft.ops.RangeJoin.pointInInterval(pts, bands, bucketWidth = 5.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), sum(centsCol("v")).as("sum_cents"))
    }),
    // interval-overlap join (graft.ops.RangeJoin.intervalOverlap —
    // canonical-bucket exactly-once, no post-join dedup shuffle):
    // deterministic activity intervals derived from events
    // ([sec(ts), sec(ts) + 5min..2h)), self-joined per user for
    // overlapping pairs (a_id < b_id canonicalizes the symmetric
    // pair), rolled up per user. All values are integer-valued
    // doubles so the oracle compare is exact.
    "range_session_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tsc = eventTs(ev)
      val iv = ev.select(col("user_id"), col("event_id"),
          tsc.cast("long").cast("double").as("lo"))
        .withColumn("hi",
          col("lo") + lit(300.0) + (col("event_id") % 24).cast("double") * 300.0)
      val left = iv.select(col("user_id"), col("event_id").as("a_id"),
        col("lo"), col("hi"))
      val right = iv.select(col("user_id"), col("event_id").as("b_id"),
        col("lo").as("lo2"), col("hi").as("hi2"))
      graft.ops.RangeJoin.intervalOverlap(left, right, bucketWidth = 3600.0,
          keys = Seq("user_id"))
        .where(col("a_id") < col("b_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum((least(col("hi"), col("hi2")) - greatest(col("lo"), col("lo2")))
            .cast("long")).as("overlap_sec"))
    }),
    // as-of join (operator Spark lacks — graft.ops.AsOf union-sort
    // reformulation): for every event, the user's latest click at or
    // before it; inner face (events with no prior click dropped)
    "asof_last_click" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val left = ev.select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
      val right = ev.where(col("event_type") === "click")
        .select(col("user_id").as("k"), col("ts").as("t"), col("event_id").as("rid"))
      graft.ops.AsOf.asOfJoin(left, right)
        .where(col("rid").isNotNull)
        .select(col("event_id"), col("rid").as("last_click_id"))
    }),
    // as-of join with TOLERANCE (max staleness — pandas merge_asof
    // face): latest click at or before each event but no older than
    // 30 minutes. Times normalized to epoch SECONDS (numeric t
    // contract) — a distinct, coarser ordering than asof_last_click,
    // mirrored exactly in the oracle.
    "asof_last_click_tol" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tsc = eventTs(ev)
      val base = ev.select(col("user_id").as("k"), tsc.cast("long").as("t"),
        col("event_id"), col("event_type"))
      val left = base.select(col("k"), col("t"), col("event_id"))
      val right = base.where(col("event_type") === "click")
        .select(col("k"), col("t"), col("event_id").as("rid"))
      graft.ops.AsOf.asOfJoin(left, right, tolerance = Some(1800L))
        .where(col("rid").isNotNull)
        .select(col("event_id"), col("rid").as("last_click_id"))
    }),
    // event throttling ("debounce"): drop events arriving < 60 s
    // after the previous same-type event of the same user — the
    // lag-window event-stream cleaning face (one shuffle on the key,
    // same plan any per-key analytic needs)
    "events_min_gap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tsc = eventTs(ev)
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("tsec"), col("event_id"))
      ev.select(col("event_id"), col("user_id"), col("event_type"),
          tsc.cast("long").as("tsec"))
        .withColumn("prev", lag(col("tsec"), 1).over(w))
        .where(col("prev").isNull || col("tsec") - col("prev") >= 60)
        .select("event_id")
    }),
    // FORWARD as-of join (pandas direction="forward"): the earliest
    // click at or after each event — time-to-next-interaction, the
    // symmetric face of asof_last_click (same one-window plan)
    "asof_next_click" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val left = ev.select(col("user_id").as("k"), col("ts").as("t"), col("event_id"))
      val right = ev.where(col("event_type") === "click")
        .select(col("user_id").as("k"), col("ts").as("t"), col("event_id").as("rid"))
      graft.ops.AsOf.asOfJoin(left, right, forward = true)
        .where(col("rid").isNotNull)
        .select(col("event_id"), col("rid").as("next_click_id"))
    }),
    // event-time tumbling windows: Spark's window() operator (the
    // same TimeWindow Structured Streaming aggregates over — the
    // reference has no event-time processing, SURVEY.md §2.7 St7) on
    // the batch surface. ts arrives as nanos-since-epoch long
    // (parquet TIMESTAMP(NANOS) + nanosAsLong) or as a native
    // timestamp; both normalize to micros. Window starts are emitted
    // as epoch seconds (BIGINT) so the oracle compare is
    // timezone-representation-free.
    "window_tumbling_events" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tsc = eventTs(ev)
      ev.groupBy(window(tsc, "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(centsCol("value")).as("sum_value_cents"))
        .select(col("w.start").cast("long").as("win_start"),
          col("event_type"), col("n"), col("sum_value_cents"))
    }),
    // SLIDING event-time windows (6h window, 2h slide): every event
    // lands in 3 overlapping windows — the report-every-slide face of
    // window_tumbling_events, same cents-exact money math
    "window_sliding_events" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tsc = eventTs(ev)
      ev.groupBy(window(tsc, "6 hours", "2 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(centsCol("value")).as("sum_value_cents"))
        .select(col("w.start").cast("long").as("win_start"),
          col("event_type"), col("n"), col("sum_value_cents"))
    }),
    // json functions: extract + aggregate over the props payload
    "json_props_stats" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))),
    // exact distinct counting (the relational verifier; the sketch
    // path is approx_count_distinct, demonstrated in tests)
    "distinct_users_by_type" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),
    // exact interpolated quantiles over integral quantities
    "quantiles_quantity" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("q50"),
          percentile(col("l_quantity"), lit(0.9)).as("q90"))),
    // string functions: case/substring/length over part names
    "string_part_stats" -> ((s, d) =>
      Tables.part(s, d)
        .groupBy(upper(substring(col("p_type"), 1, 5)).as("type_prefix"))
        .agg(count(lit(1)).as("n"),
          max(length(col("p_name"))).cast("long").as("max_name_len"),
          min(col("p_brand")).as("first_brand"))),
  )

  override def oracles: Map[String, String] = Map(
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS count_order,
        |  round(sum(l_quantity)/count(*), 6) AS avg_qty
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "join_mktsegment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "join_brand_nation" ->
      """SELECT p_brand, n_name, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    // the salted join must equal the plain equi-join
    "join_events_segment_salted" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin,
    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "setop_common_nations" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT DISTINCT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "anti_customers_no_events" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)""".stripMargin,
    "semi_parts_used" ->
      """SELECT p_type, count(*) AS n FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY 1""".stripMargin,
    "rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "orders_by_year" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders GROUP BY 1""".stripMargin,
    // pivot restated as conditional aggregation
    "pivot_status_by_year" ->
      """SELECT year(o_orderdate) AS yr,
        |  CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
        |  CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY 1""".stripMargin,
    // recomputed from the ORIGINAL orders table — the Spark side went
    // through the partitioned write/read, so any value lost or
    // mangled in the layout roundtrip breaks the hash
    "warehouse_roundtrip" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |WHERE year(o_orderdate) BETWEEN 1994 AND 1995
        |GROUP BY 1, 2""".stripMargin,
    "sessionize_events" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id,
        |  CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS session_start,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // the oracle is the naive theta-join over the same generated bands
    "range_value_bands" ->
      """WITH bands AS (SELECT i AS band_id, i*5.0 AS lo, i*5.0 + 10.0 AS hi
        |               FROM range(0, 100) t(i))
        |SELECT band_id, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY 1""".stripMargin,
    // the oracle is the naive theta self-join over the same derived
    // intervals (an INDEPENDENT formulation of overlap semantics —
    // quadratic-within-key, fine at oracle scale)
    "range_session_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS DOUBLE) AS lo,
        |    CAST(epoch(date_trunc('second', ts)) AS DOUBLE)
        |      + 300 + (event_id % 24) * 300 AS hi
        |  FROM events)
        |SELECT a.user_id, count(*) AS n_pairs,
        |  CAST(sum(CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) AS BIGINT))
        |    AS BIGINT) AS overlap_sec
        |FROM iv a JOIN iv b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND a.lo < b.hi AND b.lo < a.hi
        |GROUP BY 1""".stripMargin,
    // the oracle is the naive per-event argmax over admissible clicks
    // (an INDEPENDENT formulation of the as-of semantics — quadratic,
    // fine at oracle scale)
    "asof_last_click" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |j AS (SELECT e.event_id, c.click_id,
        |        row_number() OVER (PARTITION BY e.event_id
        |          ORDER BY c.ts DESC, c.click_id DESC) AS rn
        |      FROM events e JOIN c
        |        ON e.user_id = c.user_id AND c.ts <= e.ts)
        |SELECT event_id, click_id AS last_click_id FROM j WHERE rn = 1""".stripMargin,
    // identical lag formulation on the same epoch-seconds timeline
    "events_min_gap" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec FROM events),
        |l AS (SELECT event_id, tsec,
        |        lag(tsec) OVER (PARTITION BY user_id, event_type
        |          ORDER BY tsec, event_id) AS prev
        |      FROM ev)
        |SELECT event_id FROM l WHERE prev IS NULL OR tsec - prev >= 60""".stripMargin,
    // the naive forward argmin oracle: earliest admissible click,
    // ties by greatest click_id (mirrors the engine's tie-break)
    "asof_next_click" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |j AS (SELECT e.event_id, c.click_id,
        |        row_number() OVER (PARTITION BY e.event_id
        |          ORDER BY c.ts ASC, c.click_id DESC) AS rn
        |      FROM events e JOIN c
        |        ON e.user_id = c.user_id AND c.ts >= e.ts)
        |SELECT event_id, click_id AS next_click_id FROM j WHERE rn = 1""".stripMargin,
    // the same naive argmax oracle, restricted to the 30-minute
    // staleness bound, on the same epoch-seconds timeline
    "asof_last_click_tol" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec FROM events),
        |c AS (SELECT event_id AS click_id, user_id, tsec FROM ev
        |      WHERE event_type = 'click'),
        |j AS (SELECT e.event_id, c.click_id,
        |        row_number() OVER (PARTITION BY e.event_id
        |          ORDER BY c.tsec DESC, c.click_id DESC) AS rn
        |      FROM ev e JOIN c
        |        ON e.user_id = c.user_id AND c.tsec <= e.tsec
        |       AND e.tsec - c.tsec <= 1800)
        |SELECT event_id, click_id AS last_click_id FROM j WHERE rn = 1""".stripMargin,
    // time_bucket's default origin (2000-01-01) is itself 6-hour-
    // aligned with the epoch (946684800 s = 43828 × 21600 s), so its
    // buckets coincide with Spark's epoch-aligned tumbling windows
    "window_tumbling_events" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '6 hours', ts)) AS BIGINT) AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    // sliding = tumbling on the slide grid, replicated over the 3
    // overlapping window starts (window=6h, slide=2h → k ∈ {0,1,2})
    "window_sliding_events" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '2 hours', ts)
        |                  - k.k * INTERVAL '2 hours') AS BIGINT) AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events CROSS JOIN (VALUES (0), (1), (2)) AS k(k)
        |GROUP BY 1, 2""".stripMargin,
    "json_props_stats" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "distinct_users_by_type" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "quantiles_quantity" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.9) AS q90
        |FROM lineitem GROUP BY 1""".stripMargin,
    "string_part_stats" ->
      """SELECT upper(substr(p_type, 1, 5)) AS type_prefix, count(*) AS n,
        |  max(length(p_name)) AS max_name_len,
        |  min(p_brand) AS first_brand
        |FROM part GROUP BY 1""".stripMargin,
  )
}
