package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Warehouse layout faces: Hive-style partitioned parquet and bucketed
  * tables — the two physical-layout levers a 100 TB corpus lives by.
  *
  *  - PARTITIONED (`key=value/` directories): coarse pruning. A query
  *    filtering on the partition key never opens the other
  *    directories — the scan's `PartitionFilters` eliminate them at
  *    planning/runtime, so cost scales with the slice, not the table
  *    (PlanSpec pins this on the physical plan; `warehouse_roundtrip`
  *    pins write→read value fidelity under the DuckDB hash gate).
  *    Partition keys must be low-cardinality (dates, langs, sources):
  *    a high-cardinality key explodes the directory count and kills
  *    the listing.
  *  - BUCKETED (`bucketBy` tables): fine-grained co-location. Both
  *    sides of a recurring equi-join pre-shuffled into the same
  *    bucket count on the join key read co-located — the join plans
  *    with NO Exchange on either side (pinned by PlanSpec). This is
  *    the "pay the shuffle once at write time" contract that makes
  *    repeated fact-to-fact joins viable at scale.
  */
object Warehouse {

  /** Partitioned parquet write. The pre-write `repartition` on the
    * partition keys hash-routes each key to ONE task, so each
    * `key=value/` directory gets one file instead of one file per
    * task that happened to hold rows of that key — the small-files
    * explosion that ruins listing and open costs at scale. Tradeoff:
    * a skewed partition is written by a single task; for a known-hot
    * key, salt the repartition (not the directory layout). */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): Unit = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    df.repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
  }

  /** Partition-discovering read of a [[writePartitioned]] layout: the
    * partition columns come back as columns, and filters on them
    * become `PartitionFilters` (directory pruning), not data
    * filters. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetRowsPerFile`-row files. Micro-batch sinks and per-task
    * writes accumulate files whose listing/open/footer costs dominate
    * scans long before data volume does (the classic small-files
    * problem); compaction is the periodic maintenance pass that
    * restores scan efficiency. Rows are range-repartitioned on
    * `sortCols` so each output file covers a tight key range —
    * min/max stats then prune compacted files the way a z-order/sort
    * layout does (data-skipping survives the rewrite).
    *
    * Writes to `outPath` (never in place: a failed in-place rewrite
    * loses the table — swap directories atomically outside this
    * call). Returns (filesBefore, filesAfter) so callers can log the
    * win. Row multiset is preserved exactly (CompactionSpec). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              sortCols: Seq[String], targetRowsPerFile: Long): (Int, Int) = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val nFiles = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
    def parquetFiles(p: String): Int = {
      val dir = new java.io.File(p)
      if (!dir.isDirectory) 0
      else dir.listFiles((_, name) => name.endsWith(".parquet")).length
    }
    (parquetFiles(inPath), parquetFiles(outPath))
  }

  /** Bucketed + sorted table write ("pay the shuffle once"): rows are
    * hash-bucketed on `key` into `nBuckets` files per partition and
    * sorted by `key` within each bucket, so later equi-joins and
    * aggregations on `key` between same-bucketed tables skip both the
    * Exchange and (with the sort) the Sort. Bucketing only exists for
    * catalog tables — hence `saveAsTable`, not a path write. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }
}
