package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources for 2-D point sets (SURVEY.md §2.1 S1, §2.2 P1/P5).
  *
  * The reference ingests headerless CSV `x,y` lines via
  * `sc.textFile` + `split(',')` (`HWK_1/G029HW1.py:142-145`); here the
  * built-in CSV reader applies the schema at scan time (parse errors
  * become nulls → dropped, matching float() strictness loosely), and
  * `repartition(L)` is the reference's explicit parallelism knob.
  */
object Points {

  /** S1+P1: read `x,y` CSV into a points DataFrame (`x`, `y` double,
    * `id` = stable line-derived id via monotonically increasing order
    * is NOT used — ids come from zipWithIndex on first need). */
  def fromCsv(spark: SparkSession, path: String, l: Int = 0): DataFrame = {
    val df = spark.read
      .schema("x DOUBLE, y DOUBLE")
      .option("header", "false")
      .csv(path)
      .where(col("x").isNotNull && col("y").isNotNull)
    if (l > 0) df.repartition(l) else df
  }

  /** Points with a unique id column for the exact-outlier join (the
    * reference identifies points by value; ids only disambiguate
    * duplicates). Deterministic rank over (x, y), 1-based — but
    * DISTRIBUTED: a range-partitioned sortBy + zipWithIndex, not a
    * global `row_number()` window (a no-partition-key window funnels
    * the whole dataset through ONE task — a scale-killer at 100 TB).
    * Ties (duplicate coordinates) get distinct ids in both
    * formulations; which duplicate gets which id is irrelevant since
    * the rows are identical. */
  def withIds(points: DataFrame): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    points.select(col("x").cast("double"), col("y").cast("double"))
      .as[(Double, Double)]
      .rdd
      .sortBy(identity)           // distributed range sort, keeps parallelism
      .zipWithIndex()             // one tiny job for partition offsets, no shuffle
      .map { case ((x, y), i) => (x, y, i + 1L) }
      .toDF("x", "y", "id")
  }
}
