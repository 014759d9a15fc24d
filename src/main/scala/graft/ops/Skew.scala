package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation: two-stage salted groupBy.
  *
  * A single hot key funnels its entire group through one reduce task;
  * salting splits each key into `salts` sub-groups aggregated in
  * parallel, then combines the partials with a second (tiny) shuffle.
  * Results are identical to the direct groupBy for any aggregate that
  * decomposes into partial+final (counts, sums, min/max). AQE's skew
  * handling covers joins; salting remains the tool for skewed
  * AGGREGATIONS with decomposable functions at extreme fan-in.
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
}
