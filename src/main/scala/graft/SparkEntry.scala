package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain packs under `graft.queries`;
  * each key has a Spark implementation and (where SQL-expressible) a
  * DuckDB oracle with IDENTICAL column names/aliases.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    OutlierQueries,
    FftQueries,
    FreqQueries,
    DocQueries,
    StreamQueries,
    RelationalQueries,
    MediaQueries,
    CheckQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full MRApproxOutliers cell-stats pipeline (scan → project → grid agg
    * → neighbor join → agg). */
  def entry(spark: SparkSession): DataFrame =
    queries("outlier_n3n7")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
