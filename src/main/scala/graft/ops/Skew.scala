package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation and joins: salting.
  *
  * A single hot key funnels its entire group through one reduce task;
  * salting splits each key into `salts` sub-groups processed in
  * parallel. For AGGREGATIONS the partials are combined with a second
  * (tiny) shuffle — identical results for any aggregate that
  * decomposes into partial+final (counts, sums, min/max). For JOINS
  * the probe side is salted randomly and the build side replicated
  * across all salts, so a hot key's pairs spread over `salts` tasks
  * ([[saltedJoin]]). AQE's runtime skew-join split covers the
  * sort-merge path when statistics surface the skew; explicit salting
  * is the deterministic tool when they don't (a two-table equi-join
  * whose hot keys are known or unbounded), and the only one that also
  * works under a shuffled hash join.
  */
object Skew {

  /** count per key, salted: identical to groupBy(key).count(). */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("cnt"))

  /** sum of `valueCol` per key, salted. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("sum"))

  /** Skew-salted inner equi-join: result identical to
    * `probe.join(build, probe(probeKey) === build(buildKey))`.
    *
    * The probe (large, skewed) side gets a random salt in [0, salts);
    * the build side is replicated once per salt value, so every
    * (key, salt) pair holds exactly the build rows of that key and
    * each probe row meets each matching build row exactly once — the
    * result multiset is salt-invariant, which is why the random salt
    * assignment doesn't break determinism. A hot probe key's rows now
    * hash to `salts` distinct shuffle partitions instead of one.
    *
    * Cost model at scale: build is scanned once but shuffled `salts`
    * times over — salting trades build-side replication for probe-side
    * balance, so size `salts` to the skew factor (hot-key share ×
    * partition count), not higher. The build side carries a
    * shuffle-hash hint: the probe side should not be sorted (it is the
    * huge side), and a broadcast would make salting pointless (a
    * broadcast join has no per-key reduce task to overload — prefer
    * plain `broadcast()` when the build fits).
    *
    * Try AQE FIRST: `spark.sql.adaptive.skewJoin.enabled` splits a
    * skewed sort-merge/shuffle-hash partition at runtime with no code
    * change (PlanSpec pins the split firing). Reach for saltedJoin
    * when AQE can't see or can't fix the skew: stats hidden behind a
    * non-shuffle boundary, skew INSIDE one key (AQE splits a
    * partition's extra blocks, but one key's build rows must still
    * co-locate in full), or a deterministic plan requirement. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(probeKey != buildKey,
      "probe and build key columns must be named differently (rename one side)")
    val p = probe.withColumn("_psalt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val b = build.withColumn("_bsalt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    p.join(b.hint("shuffle_hash"),
        col(probeKey) === col(buildKey) && col("_psalt") === col("_bsalt"))
      .drop("_psalt", "_bsalt")
  }
}
