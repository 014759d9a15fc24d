package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Document-corpus sources beyond parquet: JSONL (one JSON object per
  * line — the lingua franca of training-data interchange) and CSV,
  * plus the JSONL sink face.
  *
  * Scale rules baked in:
  *  - schema is DECLARED at scan, never inferred — `inferSchema` reads
  *    the data twice and samples types non-deterministically, both
  *    disqualifying at 100 TB;
  *  - malformed lines are the caller's choice: PERMISSIVE routes them
  *    to a `_corrupt` column for quarantine-and-continue (the default
  *    a large crawl wants), FAILFAST kills the job on the first bad
  *    line (what a curated corpus wants);
  *  - JSONL scans split by line across executors, so a single giant
  *    file still parallelizes (unlike e.g. one gzip member). The CSV
  *    face uses `multiLine` (document text contains quoted newlines),
  *    which parses each FILE whole — so a CSV corpus must arrive as
  *    many files to parallelize; prefer JSONL for interchange.
  */
object Docs {

  /** The `documents` table schema (FIXTURES.md): doc_id, text, lang,
    * source, n_chars. */
  val schema: StructType = StructType.fromDDL(
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")

  private def reader(spark: SparkSession, mode: String) = {
    require(Seq("PERMISSIVE", "FAILFAST", "DROPMALFORMED").contains(mode),
      s"unknown parse mode $mode")
    spark.read
      .schema(if (mode == "PERMISSIVE") schema.add("_corrupt", "string") else schema)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", "_corrupt")
  }

  /** JSON-lines corpus scan. With PERMISSIVE (default), malformed
    * lines surface as rows whose `_corrupt` column holds the raw
    * line and every schema column is null — filter or quarantine
    * downstream. */
  def fromJsonl(spark: SparkSession, path: String,
                mode: String = "PERMISSIVE"): DataFrame =
    reader(spark, mode).json(path)

  /** Headered CSV corpus scan, same contract as [[fromJsonl]]. */
  def fromCsv(spark: SparkSession, path: String,
              mode: String = "PERMISSIVE"): DataFrame =
    reader(spark, mode).option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(path)

  /** JSONL sink: one JSON object per line, split into `numFiles`
    * parts (executor-side write, no driver collect). */
  def toJsonl(docs: DataFrame, path: String, numFiles: Int = 0): Unit = {
    val df = if (numFiles > 0) docs.repartition(numFiles) else docs
    df.write.mode("overwrite").json(path)
  }

  /** ORC faces — the third container format next to parquet
    * (warehouse) and JSONL (interchange), for lakes standardized on
    * the ORC stack. Columnar with per-stripe min/max statistics, so
    * the same scan-efficiency properties hold as for parquet: filters
    * push into the reader (`PushedFilters` in the plan — pinned by
    * PlanSpec) and projection prunes columns; schema is declared, not
    * inferred, like every scan here. Lossless multiset roundtrip is
    * law `check_orc_roundtrip`. ORC has no PERMISSIVE quarantine
    * (binary container — a corrupt stripe fails the task loudly
    * rather than yielding null rows), hence no `mode` parameter. */
  def fromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  def toOrc(docs: DataFrame, path: String, numFiles: Int = 0): Unit = {
    val df = if (numFiles > 0) docs.repartition(numFiles) else docs
    df.write.mode("overwrite").orc(path)
  }
}
