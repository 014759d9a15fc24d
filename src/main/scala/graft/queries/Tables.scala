package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access + the deterministic point projection shared by every
  * outlier/clustering query and its DuckDB oracle.
  *
  * The reference reads 2-D points from CSV (`HWK_1/G029HW1.py:142-145`);
  * the driver harness supplies TPC-H-ish parquet instead, so points are
  * DERIVED from `lineitem`: x = l_extendedprice/1000, y = l_quantity,
  * id = l_orderkey*8 + l_linenumber (unique: l_linenumber ≤ 7).
  * The projection is stated in SQL in every oracle so both engines see
  * bit-identical doubles.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    = read(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Memoized corpus size (the ANN query layer derives its scale
    * parameters — nBits, nlist — from it). The test tables are
    * immutable per directory, so the count is computed once per JVM:
    * a parquet-metadata job, but still a job, and it would otherwise
    * run inside every timed/verified ANN query body. */
  private val countCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  def embeddingsCount(s: SparkSession, d: String): Long =
    countCache.getOrElseUpdate(d + ":embeddings", embeddings(s, d).count())
  def documentsCount(s: SparkSession, d: String): Long =
    countCache.getOrElseUpdate(d + ":documents", documents(s, d).count())

  /** Spread a single-file scan across the cluster: the driver's
    * parquet files are one row group each, so the scan is one task —
    * every compute-heavy pipeline repartitions to default parallelism
    * first (the reference's explicit `repartition(L)`,
    * `HWK_1/G029HW1.py:148`). */
  def parallelize(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Point cloud `x, y` (no id — grid/FFT operators are id-free, and
    * the pruned scan reads only 2 of 11 lineitem columns). */
  def points(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      (col("l_extendedprice") / 1000.0).as("x"),
      col("l_quantity").as("y"))

  /** Points with a UNIQUE id for the exact-outlier join. The synthetic
    * lineitem has duplicate (l_orderkey, l_linenumber) pairs, so the
    * natural key is deduplicated with a per-key window (partitioned —
    * no global sort; ties have identical coords so the surviving row
    * set is deterministic). Kept as the window formulation
    * deliberately: a `min(struct(x, y))` groupBy is plan-equivalent
    * on paper but a struct aggregation buffer forces SortAggregate
    * (no hash agg), which the r20 A/B measured ~2× slower than the
    * WindowGroupLimit-pruned window. */
  def pointsWithId(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = lineitem(s, d).select(
      (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
      (col("l_extendedprice") / 1000.0).as("x"),
      col("l_quantity").as("y"))
    val w = Window.partitionBy("id").orderBy("x", "y")
    raw.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** SQL CTE bodies mirroring the two projections (DuckDB oracle). */
  val pointsSql: String =
    "SELECT l_extendedprice/1000.0 AS x, l_quantity AS y FROM lineitem"
  val pointsWithIdSql: String =
    """SELECT id, x, y FROM (
      |  SELECT l_orderkey*8 + l_linenumber AS id,
      |         l_extendedprice/1000.0 AS x, l_quantity AS y,
      |         row_number() OVER (PARTITION BY l_orderkey*8 + l_linenumber
      |                            ORDER BY l_extendedprice/1000.0, l_quantity) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin
}

/** A domain registry: each ops area contributes queries + oracles. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
