package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.{ContinuousIngest, Snapshot}
import graft.streaming.ContinuousIngest.{AnnParams, IngestParams, IngestState}

/** Dev utility: measure the snapshot-shipping lifecycle
  * ([[graft.streaming.Snapshot]]) at corpus scale — the numbers
  * behind SCALING.md's incremental-export claims. Builds an
  * ann-enabled primary over n synthetic vectors (the ServeProbe
  * generator family), then times, in lifecycle order:
  *
  *  - `export_cold_s`      first serving export (every pool dir ships)
  *  - `export_warm_s`      unchanged re-export (zero pool copies —
  *                         pure stamping + manifest + retention cost)
  *  - `export_incr_s`      after one appended 1k-doc batch (its five
  *                         index partitions ship, nothing else)
  *  - `backup_full_s`      first `full = true` backup (adds dedup
  *                         tables, takedown metadata, the bloom)
  *  - `restore_s`          point-in-time restore to a fresh root
  *  - `verify_s`           checksum audit of the standing backup
  *                         (verifyVersion: re-hash every shipped file
  *                         against its _GRAFT_SUMS entry)
  *  - `resume_s`           a SECOND restore that adopts the first
  *                         one's tree as a crashed tmp — all files
  *                         reuse by hash, so this is the pure
  *                         re-verify floor of a resumed restore
  *  - `serve_snapshot_s`   one IVFADC query batch answered from the
  *                         snapshot (sanity: the shipped tree serves)
  *
  * plus copied dir/file/byte counts per step. One JSON line.
  *
  * Usage: `runMain graft.SnapshotProbe [n] [dim]`
  * (defaults 200000, 64). Honors `SPARK_GRAFT_CPUS`.
  */
object SnapshotProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val SEED = 42L
    def vecOf(idc: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(xxhash64(idc, j, lit(SEED)), lit(2000L)).cast("double")
          / 1000.0) - 1.0).cast("float"))
    def corpusOf(ids: org.apache.spark.sql.DataFrame) =
      ids.select(col("id").as("doc_id"),
        concat(lit("d"), col("id")).as("text"), vecOf(col("id")).as("embedding"))
    val p = IngestParams(expectedDigests = n, fpp = 0.01, nearDup = false,
      ann = Some(AnnParams(nlist = Similarity.nlistFor(n))))
    val root = java.nio.file.Files.createTempDirectory("graft_snapprobe")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      val st = IngestState(s"$root/state")
      ContinuousIngest.bootstrap(corpusOf(spark.range(n).toDF("id")), st, p)
      val quant = ContinuousIngest.loadQuantizers(spark, st, p.ann.get)

      val ex = s"$root/export"
      val (r0, tCold) = timed(Snapshot.export(spark, st, ex))
      val (r1, tWarm) = timed(Snapshot.export(spark, st, ex))
      ContinuousIngest.ingestBatch(
        corpusOf(spark.range(n, n + 1000L).toDF("id")), 0L, st, p, Some(quant))
      val (r2, tIncr) = timed(Snapshot.export(spark, st, ex))
      val bk = s"$root/backup"
      val (rf, tFull) = timed(Snapshot.export(spark, st, bk, full = true))
      val (_, tRestore) = timed(
        Snapshot.restore(spark, bk, s"$root/restored"))
      val (nViol, tVerify) = timed(
        Snapshot.verifyVersion(spark, bk).count())
      // resume floor: re-shape the completed restore into a crashed
      // attempt's tmp and restore again — every file re-verifies by
      // recorded hash and reuses in place (no source read, no write)
      // the tmp must match restore's STRICT adoption name — the full
      // target name plus exactly 8 hex chars (the attempt-uuid shape)
      java.nio.file.Files.move(
        java.nio.file.Path.of(s"$root/restored"),
        java.nio.file.Path.of(s"$root/.restore_tmp_resumed_0000abcd"))
      val (_, tResume) = timed(
        Snapshot.restore(spark, bk, s"$root/resumed"))
      val snap = Snapshot.state(spark, ex)
      val q = corpusOf(spark.range(0L, 100L * 1997L, 1997L).toDF("id"))
      val (nAns, tServe) = timed(
        ContinuousIngest.annIvfPqMaintained(spark, snap, p.ann.get, q,
          k = 10, nprobe = 4, rerank = 32, Some(quant)).count())
      println(s"""{"probe":"snapshot","n":$n,"dim":$dim""" +
        s""","export_cold_s":${f(tCold)},"cold_dirs":${r0.copiedPoolDirs}""" +
        s""","cold_files":${r0.copiedFiles},"cold_bytes":${r0.copiedBytes}""" +
        s""","export_warm_s":${f(tWarm)},"warm_dirs":${r1.copiedPoolDirs}""" +
        s""","export_incr_s":${f(tIncr)},"incr_dirs":${r2.copiedPoolDirs}""" +
        s""","incr_bytes":${r2.copiedBytes}""" +
        s""","backup_full_s":${f(tFull)},"full_dirs":${rf.copiedPoolDirs}""" +
        s""","full_bytes":${rf.copiedBytes}""" +
        s""","restore_s":${f(tRestore)}""" +
        s""","verify_s":${f(tVerify)},"verify_findings":$nViol""" +
        s""","resume_s":${f(tResume)}""" +
        s""","serve_snapshot_s":${f(tServe)},"serve_rows":$nAns}""")
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(x => Files.deleteIfExists(x))
      catch { case _: Throwable => () }
      spark.stop()
    }
  }

  private def f(d: Double): String = f"$d%.2f"
}
