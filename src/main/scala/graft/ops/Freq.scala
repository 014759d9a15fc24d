package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequent-items over a bounded stream — exact histogram, Reservoir
  * Sampling, Sticky Sampling (HW3, `HWK_3/G029HW3.py`).
  *
  * The reference keeps ALL algorithmic state on the driver (a Python
  * dict / list mutated per micro-batch, `HWK_3/G029HW3.py:53-63,87-90`)
  * — a non-starter at 100 TB. Here each algorithm is re-expressed as a
  * distributed, deterministic dataflow:
  *
  *  - Exact histogram / frequent items: `groupBy(item).count()` +
  *    threshold filter (`count ≥ φ·n`, line 117).
  *  - Reservoir Sampling (Algorithm R, lines 10-19): Algorithm R's
  *    output is a uniform random m-subset of the stream. The
  *    distributed twin draws the SAME distribution shuffle-free: key
  *    every arrival by a seeded 64-bit hash of its arrival index and
  *    keep the m smallest keys (`TakeOrderedAndProject` — one pass,
  *    partial top-m per partition, no full sort). Seeded → reproducible.
  *  - Sticky Sampling (lines 22-29): the sequential rule "flip a coin
  *    with prob r/n for each occurrence of an untracked item; once
  *    tracked, count every occurrence" is equivalent to: per item, find
  *    the FIRST occurrence whose independent coin succeeds, then count
  *    that occurrence and all later ones. (Coins of already-tracked
  *    occurrences are never consulted, so flipping them eagerly changes
  *    nothing.) That is a groupBy(min) + self-join + groupBy(count) —
  *    fully distributed, no sequential state.
  *
  * Reference-exact sequential folds are kept for parity tests; the
  * contract between the two is distributional (SURVEY.md §2.7 St5/St6).
  */
object Freq {

  /** A7 — exact frequency histogram: `item, cnt`. */
  def histogram(items: DataFrame): DataFrame =
    items.groupBy("item").agg(count(lit(1)).as("cnt"))

  /** St3 — exact frequent items: cnt ≥ φ·n with n = stream length
    * (`HWK_3/G029HW3.py:117`). */
  def frequentItems(items: DataFrame, phi: Double): DataFrame = {
    val n = items.count()
    histogram(items).where(col("cnt") >= lit(phi * n))
  }

  /** J4 — membership annotation: estimated items flagged +/- against
    * the true-frequent set (`HWK_3/G029HW3.py:140-143`). */
  def annotate(estimated: DataFrame, trueFreq: DataFrame): DataFrame =
    estimated
      .join(trueFreq.select(col("item"), lit(true).as("is_true")), Seq("item"), "left")
      .withColumn("is_true", coalesce(col("is_true"), lit(false)))

  // ---------------------------------------------------------------
  // St5 — Reservoir Sampling
  // ---------------------------------------------------------------

  /** Reference-exact Algorithm R (`HWK_3/G029HW3.py:10-19`): item t
    * (1-based) enters a full reservoir with prob m/t, replacing a
    * uniform random slot. Sequential by nature — parity/test twin. */
  def reservoirLocal(items: Iterator[Long], m: Int, rnd: scala.util.Random): Array[Long] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Long](m)
    var t = 0L
    items.foreach { x =>
      t += 1
      if (buf.length < m) buf += x
      else if (rnd.nextDouble() < m.toDouble / t) buf(rnd.nextInt(m)) = x
    }
    buf.toArray
  }

  /** Distributed twin: uniform m-subset as "m smallest seeded hashes of
    * the arrival index". Input needs `ord` (arrival order, unique) and
    * `item`. Output: `ord, item` (the sample, in arrival order). */
  def reservoirSample(items: DataFrame, m: Int, seed: Long): DataFrame =
    items
      .withColumn("hkey", xxhash64(col("ord"), lit(seed)))
      .orderBy("hkey")
      .limit(m)
      .select("ord", "item")

  /** WEIGHTED reservoir sampling (Efraimidis–Spirakis A-Res): an
    * m-subset where item i's inclusion probability is proportional to
    * its weight — the training-data mix sampler ("sample documents ∝
    * quality score"). Each item gets key `u^(1/w)` with `u` a seeded
    * uniform from its id hash; the sample is the m LARGEST keys.
    * Distributed exactly like [[reservoirSample]]: a top-m over a
    * per-row expression — map-side TakeOrdered partial per partition,
    * merge of P·m candidates, no shuffle of the corpus, no sequential
    * state. Deterministic given (seed, ids, weights).
    *
    * Computed in log space for stability (`ln key = ln(u)/w`, same
    * ordering): u is never 0 (hash bucket midpoint), w must be > 0 —
    * non-positive AND null weights fail loudly rather than silently
    * never sampling (a null w falls through the `w > 0` guard the
    * same way a negative one does).
    * Input: `id` (unique), `w` (double). Output: `id, w`. */
  def weightedSample(items: DataFrame, m: Int, seed: Long): DataFrame = {
    // u ∈ (0,1): 40-bit seeded hash bucket midpoint (never 0 or 1)
    val u = (pmod(xxhash64(col("id"), lit(seed)), lit(1L << 40)).cast("double")
      + lit(0.5)) / lit((1L << 40).toDouble)
    items
      .withColumn("_wkey",
        when(col("w") > 0, log(u) / col("w"))
          .otherwise(raise_error(format_string(
            "weightedSample: non-positive or null weight %s for id %s",
            coalesce(col("w").cast("string"), lit("null")), col("id")))))
      // id tie-break: u has 2^40 distinct values, so equal-weight hash
      // collisions WILL happen at corpus scale — without it the m-th
      // slot would fall to partition encounter order, breaking the
      // determinism contract
      .orderBy(col("_wkey").desc, col("id"))
      .limit(m)
      .select("id", "w")
  }

  /** Deterministic stratified sample: within each stratum keep the
    * `ceil(frac·|stratum|)` rows with the smallest seeded hash —
    * EXACT per-stratum sizes (a Bernoulli `sampleBy` only hits the
    * fraction in expectation, which skews small strata — the ones a
    * training mix cares most about), deterministic given the seed,
    * and stable under repartitioning (hash + id tie-break, never
    * encounter order).
    *
    * One shuffle on the stratum key; each stratum sorts locally for
    * the rank window. Stratum skew maps to task skew — at extreme
    * scale pre-salt the rank (two-stage top-k per stratum) the same
    * way [[graft.ops.Skew]] splits hot aggregation keys; at the
    * corpus-mixture scales this targets (strata = languages/sources),
    * per-stratum sort is the right trade.
    *
    * The cutoff is computed in DECIMAL arithmetic (`frac`'s shortest
    * decimal representation, exact multiply): a double product like
    * 55·0.2 = 11.000000000000002 would otherwise ceil to 12 and keep
    * one extra row whenever frac·n lands on an integer.
    * Input: any df with `stratumCol` and a unique `idCol`.
    * Output: the sampled input rows, original columns. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       frac: Double, seed: Long): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    import org.apache.spark.sql.expressions.Window
    val rank = Window.partitionBy(stratumCol)
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    val size = Window.partitionBy(stratumCol)
    df.withColumn("_rk", row_number().over(rank))
      .withColumn("_n", count(lit(1)).over(size))
      .where(col("_rk") <= ceil(col("_n") * lit(BigDecimal(frac))))
      .drop("_rk", "_n")
  }

  /** Per-group quota — the RefinedWeb-style per-domain/source cap a
    * curation run applies so no single domain dominates the mix: keep
    * the `cap` rows with the smallest seeded order key in each group,
    * drop the rest. The key is `md5(seed:id)` — deterministic across
    * runs and engines, decorrelated from ingest order (a head-of-table
    * cap would keep whatever the crawler saw first), id tie-broken.
    *
    * One shuffle on the group key; rank is a per-group window, so the
    * same skew note as [[stratifiedSample]] applies (a pathologically
    * hot group sorts in one task — pre-salt with a two-stage top-k if
    * a group outweighs a task). Output: the kept input rows, original
    * columns. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  cap: Int, seed: Long): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= cap).drop("_rk")
  }

  /** Token-budget mixture sampling — the data-mixing primitive a
    * training run uses to hit a FIXED token budget per source/domain:
    * within each group, docs are taken in a deterministic
    * pseudo-random order (md5 of the id string — reproducible across
    * engines AND runs, never encounter order) until the group's
    * weight budget is exhausted; the doc that crosses the budget is
    * kept (exclusive-prefix rule, `cum − w < budget`), so every
    * non-empty group emits at least one doc and the kept weight is
    * the least total ≥ budget. Exact — not Bernoulli-in-expectation,
    * which misses small groups' budgets by ±√n.
    *
    * A naive per-group running sum is ONE sequential window per group
    * — with a handful of sources that is a handful of reducers at
    * 100 TB. This computes the running sum as a two-level distributed
    * prefix sum instead (the [[graft.ops.Pack.chunkPack]] idiom):
    * bucket each row by the FIRST HEX CHARS of its own sort key (so
    * bucket order is a prefix of row order and offsets compose),
    * window within (group, bucket) — `16^orderChars`-way parallel —
    * then add per-bucket offsets from a window over the tiny
    * (groups × buckets) totals table. Identical output to the
    * single-window formulation; `sample_mixture_budget`'s DuckDB
    * oracle IS that single window.
    *
    * Output: `group, id, w, cum` (one row per kept doc, cum = the
    * group's running weight INCLUDING this doc). */
  def tokenBudgetSample(df: DataFrame, weight: Column, budget: Long,
                        groupCol: String, idCol: String,
                        orderChars: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    groupPrefixSum(df, weight, groupCol, idCol, orderChars)
      .where(col("cum") - col("w") < budget)
      .select(col("group"), col("id"), col("w"), col("cum"))
  }

  /** The two-level distributed per-group prefix sum behind
    * [[tokenBudgetSample]] and [[fairShareSample]]: every row gets its
    * group's running weight (`cum`, inclusive) in the deterministic
    * seedless md5-of-id order. Output: `group, id, w, cum`. */
  private def groupPrefixSum(df: DataFrame, weight: Column, groupCol: String,
                             idCol: String, orderChars: Int): DataFrame = {
    require(orderChars >= 1 && orderChars <= 8, "orderChars in [1, 8]")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("group"), col(idCol).as("id"),
        weight.cast("long").as("w"))
      .withColumn("_k", md5(col("id").cast("string")))
      .withColumn("_b", substring(col("_k"), 1, orderChars))
    val inBucket = Window.partitionBy("group", "_b")
      .orderBy(col("_k"), col("id"))
    val cumIn = base.withColumn("_cin", sum(col("w")).over(inBucket))
    val offsets = base.groupBy("group", "_b").agg(sum(col("w")).as("_bt"))
      .withColumn("_off",
        coalesce(sum(col("_bt")).over(Window.partitionBy("group")
          .orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("group"), col("_b"), col("_off"))
    cumIn.join(offsets, Seq("group", "_b"))
      .withColumn("cum", col("_off") + col("_cin"))
      .select(col("group"), col("id"), col("w"), col("cum"))
  }

  /** Max-min fair (water-filling) token allocation across groups — the
    * UniMax-style mixture budgeting step ("UniMax: Fairer and More
    * Effective Language Sampling", Chung et al. 2023): split a TOTAL
    * token budget across sources so that no source gets more than it
    * has (`tot`) and the leftover is shared EQUALLY among the sources
    * big enough to use it. Unlike proportional or temperature
    * (`tot^α`) weighting this never over-asks a small source (no
    * epoch blow-up on low-resource domains) and needs no float `pow`
    * — the whole allocation is integer arithmetic, so the oracle is
    * exact.
    *
    * Closed form instead of the iterative water-filling loop: sort
    * groups by `tot` ascending; group i (1-based rank, inclusive
    * prefix sum pᵢ, n groups) is SATURATED iff even granting every
    * remaining group totᵢ stays within the remaining budget:
    * `totᵢ·(n−i+1) ≤ B − pᵢ₋₁`. Saturation is prefix-closed under
    * this order, so k = #saturated, and the water level
    * `T = (B − p_k) div (n − k)` funds every unsaturated group.
    * Allocation: `tot` if saturated else `T` (within n−k tokens of B
    * — the div floor; never over).
    *
    * Scale shape: one groupBy shuffle to `tot`, then every window runs
    * on the GROUPS table — sources/domains, metadata-size (the
    * single-partition sort is over #groups rows, like [[graft.ops.Pack
    * .shardPlan]]'s 256-row offset table). Overflow-safe to
    * tot ≈ 10¹² × 10⁵ groups (10¹⁷ < 2⁶³).
    *
    * Output: `group, tot, budget`. */
  def fairShareBudgets(df: DataFrame, weight: Column, budget: Long,
                       groupCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("tot"), col("group"))
    val ranked = df.groupBy(col(groupCol).as("group"))
      .agg(sum(weight.cast("long")).as("tot"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_p", sum(col("tot")).over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("_sat", col("tot") * (col("_n") - col("_rn") + 1)
        <= lit(budget) - (col("_p") - col("tot")))
    val levelRow = ranked.agg(
      sum(when(col("_sat"), 1L).otherwise(0L)).as("_kk"),
      coalesce(max(when(col("_sat"), col("_p"))), lit(0L)).as("_pk"),
      count(lit(1)).as("_ng"))
    ranked.crossJoin(broadcast(levelRow))
      .withColumn("_lvl", when(col("_kk") < col("_ng"),
        expr(s"($budget - _pk) div (_ng - _kk)")).otherwise(lit(0L)))
      .withColumn("budget", when(col("_sat"), col("tot")).otherwise(col("_lvl")))
      .select(col("group"), col("tot"), col("budget"))
  }

  /** [[fairShareBudgets]] composed with the [[tokenBudgetSample]]
    * selection: each group takes docs in the deterministic md5 order
    * until ITS fair-share budget is exhausted (same exclusive-prefix
    * rule — the crossing doc is kept, so every funded group emits at
    * least one doc). The budgets table is #groups rows, broadcast into
    * the selection join. Output: `group, id, w, cum, budget`. */
  def fairShareSample(df: DataFrame, weight: Column, budget: Long,
                      groupCol: String, idCol: String,
                      orderChars: Int = 1): DataFrame = {
    val budgets = fairShareBudgets(df, weight, budget, groupCol)
      .select(col("group"), col("budget"))
    groupPrefixSum(df, weight, groupCol, idCol, orderChars)
      .join(broadcast(budgets), Seq("group"))
      .where(col("cum") - col("w") < col("budget"))
      .select(col("group"), col("id"), col("w"), col("cum"), col("budget"))
  }

  /** Per-group exact-quantile threshold filter — the CCNet-style
    * ADAPTIVE quality cut: instead of one global threshold (which
    * over-prunes whole languages/sources whose signal distribution
    * sits lower), each group computes its own exact q-quantile of
    * `valueCol` and keeps rows at or above it. Deterministic and
    * integer-exact: the quantile is the value at rank
    * `ceil(q·n)` (decimal arithmetic — the [[stratifiedSample]] FP
    * lesson) under (value, id) order, so the same corpus always cuts
    * at the same row and the whole filter sits under a SQL hash gate
    * (`text_quality_calibrated`).
    *
    * One shuffle on the group key for the rank window (same skew note
    * as [[stratifiedSample]]); the per-group thresholds table
    * (#groups rows) broadcasts back into the filter join. Output: the
    * kept input rows + `_thr` (the group's threshold value). */
  def quantileThresholdFilter(df: DataFrame, valueCol: Column,
                              groupCol: String, idCol: String,
                              q: Double): DataFrame = {
    require(q > 0 && q < 1, s"q must be in (0, 1), got $q")
    import org.apache.spark.sql.expressions.Window
    val ranked = df.withColumn("_v", valueCol.cast("long"))
    val thresholds = ranked
      .withColumn("_rk", row_number().over(Window.partitionBy(groupCol)
        .orderBy(col("_v"), col(idCol))))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .where(col("_rk") === ceil(col("_n") * lit(BigDecimal(q))).cast("long"))
      .select(col(groupCol), col("_v").as("_thr"))
    ranked.join(broadcast(thresholds), Seq(groupCol))
      .where(col("_v") >= col("_thr"))
      .drop("_v")
  }

  // ---------------------------------------------------------------
  // St6 — Sticky Sampling
  // ---------------------------------------------------------------

  /** Reference-exact sequential fold (`HWK_3/G029HW3.py:22-29`):
    * tracked items always counted; untracked inserted with prob p. */
  def stickyLocal(items: Iterator[Long], p: Double, rnd: scala.util.Random): Map[Long, Long] = {
    val tab = scala.collection.mutable.HashMap.empty[Long, Long]
    items.foreach { x =>
      tab.get(x) match {
        case Some(c) => tab(x) = c + 1
        case None    => if (rnd.nextDouble() < p) tab(x) = 1L
      }
    }
    tab.toMap
  }

  /** Distributed twin: per-occurrence independent seeded coin; an item
    * is tracked from its first successful coin onward. `p = r/n` with
    * r = ln(1/(δφ))/ε (`HWK_3/G029HW3.py:84`). Input: `ord, item`.
    * Output: `item, cnt` (the sticky hash table). */
  def stickySample(items: DataFrame, p: Double, seed: Long): DataFrame = {
    // coin ∈ [0,1): scale a seeded 64-bit hash into the unit interval
    val coin = (pmod(xxhash64(col("ord"), lit(seed)), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))
    val coined = items.withColumn("succ", coin < lit(p))
    val firstHit = coined.where(col("succ"))
      .groupBy("item").agg(min(col("ord")).as("t0"))
    coined
      .join(firstHit, Seq("item"))
      .where(col("ord") >= col("t0"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
  }

  /** St6 final answer: estimated frequent = sticky items with
    * cnt ≥ (φ−ε)·n (`HWK_3/G029HW3.py:149`). */
  def stickyFrequent(sticky: DataFrame, phi: Double, eps: Double, n: Long): DataFrame =
    sticky.where(col("cnt") >= lit((phi - eps) * n))

  /** r = ln(1/(δφ))/ε (`HWK_3/G029HW3.py:84`). */
  def stickyRate(phi: Double, eps: Double, delta: Double): Double =
    math.log(1.0 / (delta * phi)) / eps
}
