package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: end-to-end latency of the STREAMING ANN serving face
  * (`ContinuousIngest.serve`) against a maintained index at a chosen
  * corpus scale — the deployment-facing number for the round-14
  * serving work: "what does an external top-k cost per micro-batch
  * once the index is maintained state on disk?"
  *
  * Builds an ann-enabled ingest root over n synthetic vectors (same
  * deterministic generator family as RoutedScaleProbe), then serves
  * `batches` file-chunk query batches of `nq` EXTERNAL queries each
  * through a real streaming query (checkpoint, trigger, parquet sink)
  * and reports bootstrap seconds, total stream seconds, and the
  * per-batch direct-call latency (the foreachBatch body alone, warm —
  * trigger/commit overhead excluded) as min/median. Also measures, on
  * the same maintained root: the FILTERED faces at sel = 1/3 (exact
  * filtered + filtered IVFADC medians vs the unfiltered exact
  * baseline, plus a containment spot-check) and the tombstone-delete
  * maintenance cost (`deleteDocs` of n/200 ids across every state
  * table, one timed call).
  *
  * Usage: `runMain graft.ServeProbe [n] [nq] [batches] [dim]`
  * (defaults 200000, 100, 5, 64). Honors `SPARK_GRAFT_CPUS`.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val nq = if (args.length > 1) args(1).toInt else 100
    val batches = if (args.length > 2) args(2).toInt else 5
    val dim = if (args.length > 3) args(3).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // a serving session raises the parquet In-push threshold above
      // the probed-list count so the index-only gather's
      // `list IN (...)` filter pushes EXACTLY (row-group dictionary
      // skipping) instead of falling back to a min/max range
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    import graft.streaming.{Bounded, ContinuousIngest}
    import graft.streaming.ContinuousIngest.{AnnParams, IngestParams, IngestState}

    val SEED = 42L
    def vecOf(idc: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(xxhash64(idc, j, lit(SEED)), lit(2000L)).cast("double")
          / 1000.0) - 1.0).cast("float"))
    val corpus = spark.range(n)
      .select(col("id").as("doc_id"),
        concat(lit("d"), col("id")).as("text"), vecOf(col("id")).as("embedding"))
    val ann = AnnParams(nlist = Similarity.nlistFor(n))
    val p = IngestParams(expectedDigests = n, fpp = 0.01, nearDup = false,
      ann = Some(ann))
    val root = java.nio.file.Files.createTempDirectory("graft_serve_probe")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    try {
      val st = IngestState(s"$root/state")
      val (_, bootSec) = timed { ContinuousIngest.bootstrap(corpus, st, p) }
      // external query ids (disjoint namespace), written as chunk files
      (0 until batches).foreach { b =>
        // ids offset past the corpus range, whatever n is — the probe
        // measures the EXTERNAL-query shape at any scale
        spark.range(nq)
          .select((col("id") + n + b.toLong * nq).as("doc_id"),
            vecOf(col("id") * 7L + b).as("embedding"))
          .coalesce(1).write.parquet(s"$root/qin/chunk_$b")
        Thread.sleep(5)
      }
      val (_, streamSec) = timed {
        ContinuousIngest.serve(
          Bounded.fileStream(spark, s"$root/qin/chunk_*",
            schemaDDL = "doc_id BIGINT, embedding ARRAY<FLOAT>"),
          st, ann, s"$root/served", k = 10, nprobe = 4, rerank = 32)
          .awaitTermination()
      }
      val answered = spark.read.parquet(s"$root/served").count()
      // per-batch direct-call latency, warm (the foreachBatch body
      // without trigger/commit overhead) — A/B of the two rerank float
      // stores: docs (corpus float-column scan per batch) vs
      // index-only (candidate gather from the packed segments)
      val quant = Some(ContinuousIngest.loadQuantizers(spark, st, ann))
      def directLat(fromIndex: Boolean): Seq[Double] =
        (0 until batches).map { b =>
          val q = spark.read.parquet(s"$root/qin/chunk_$b")
          timed {
            ContinuousIngest.annIvfPqMaintained(spark, st, ann, q,
              k = 10, nprobe = 4, rerank = 32, quant,
              excludeSelf = false, rerankFromIndex = fromIndex).count()
          }._2
        }.sorted
      val direct = directLat(fromIndex = false)
      val directIx = directLat(fromIndex = true)
      // the two stores must answer identically (the spec law, re-held
      // at probe scale on one batch)
      val q0 = spark.read.parquet(s"$root/qin/chunk_0")
      val a = ContinuousIngest.annIvfPqMaintained(spark, st, ann, q0,
        k = 10, nprobe = 4, rerank = 32, quant, excludeSelf = false)
      val bIx = ContinuousIngest.annIvfPqMaintained(spark, st, ann, q0,
        k = 10, nprobe = 4, rerank = 32, quant, excludeSelf = false,
        rerankFromIndex = true)
      val diff = a.exceptAll(bIx).count() + bIx.exceptAll(a).count()
      // FILTERED serving faces at sel = 1/3 (eligible = every third
      // corpus id): exact filtered (index-root-only) and filtered
      // IVFADC, against the unfiltered exact face as the baseline —
      // the widened-probe compensation should keep the filtered cost
      // within the same order as the unfiltered scan
      val eligible = spark.range(n).where(col("id") % 3 === 0)
        .select(col("id").as("doc_id"))
      def medLat(body: org.apache.spark.sql.DataFrame => Unit): Double =
        (0 until batches).map { b =>
          val q = spark.read.parquet(s"$root/qin/chunk_$b")
          timed { body(q) }._2
        }.sorted.apply(batches / 2)
      val exactMed = medLat(q => ContinuousIngest.annIvfMaintained(
        spark, st, ann, q, k = 10, nprobe = 4, quant,
        excludeSelf = false).count())
      val fltExactMed = medLat(q => ContinuousIngest.annIvfFilteredMaintained(
        spark, st, ann, q, k = 10, nprobe = 4, eligible, quant).count())
      val fltAdcMed = medLat(q => ContinuousIngest.annIvfPqFilteredMaintained(
        spark, st, ann, q, k = 10, nprobe = 4, eligible, rerank = 32,
        quantizers = quant, excludeSelf = false).count())
      // the docs-free filtered tier: same candidates, rerank floats
      // gathered from the packed segments instead of the docs column
      val fltAdcIxMed = medLat(q => ContinuousIngest.annIvfPqFilteredMaintained(
        spark, st, ann, q, k = 10, nprobe = 4, eligible, rerank = 32,
        quantizers = quant, excludeSelf = false,
        rerankFromIndex = true).count())
      // containment spot-check at probe scale: no ineligible answer
      val inelig = ContinuousIngest.annIvfFilteredMaintained(spark, st, ann,
          q0, k = 10, nprobe = 4, eligible, quant)
        .where(col("nn_id") % 3 =!= 0).count()
      // tombstone-delete maintenance cost at probe scale: purge a
      // 0.5% takedown batch (ids spread across the corpus) from every
      // state table — capture + copy-on-write partition rewrites
      val (nDel, delSec) = timed {
        ContinuousIngest.deleteDocs(spark, st,
          spark.range(n).where(col("id") % 200 === 7)
            .select(col("id").as("doc_id")))
      }
      // batched-takedown A/B at the same per-op size (n/800 ids each):
      // 3 sequential deleteDocs calls vs 3 enqueues + ONE drain — the
      // drain pays one set of detection scans + partition rewrites
      def opIds(k: Int) = spark.range(n).where(col("id") % 800 === k)
        .select(col("id").as("doc_id"))
      val (_, seqSec) = timed {
        (1 to 3).foreach(k => ContinuousIngest.deleteDocs(spark, st, opIds(k)))
      }
      val (nQ, queueSec) = timed {
        (11 to 13).foreach(k => ContinuousIngest.enqueueDelete(spark, st, opIds(k)))
        ContinuousIngest.processDeleteQueue(spark, st)
      }
      println(f"SERVE_PROBE n=$n dim=$dim nlist=${ann.nlist} nq=$nq " +
        f"batches=$batches answered=$answered bootSec=$bootSec%.1f " +
        f"streamSec=$streamSec%.1f perBatchSec=${streamSec / batches}%.1f " +
        f"directMinSec=${direct.head}%.2f " +
        f"directMedianSec=${direct(direct.size / 2)}%.2f " +
        f"directIxMinSec=${directIx.head}%.2f " +
        f"directIxMedianSec=${directIx(directIx.size / 2)}%.2f " +
        f"storeDiffRows=$diff " +
        f"exactMedianSec=$exactMed%.2f fltExactMedianSec=$fltExactMed%.2f " +
        f"fltAdcMedianSec=$fltAdcMed%.2f " +
        f"fltAdcIxMedianSec=$fltAdcIxMed%.2f fltIneligRows=$inelig " +
        f"deleteDocs=$nDel deleteSec=$delSec%.1f " +
        f"seq3DeleteSec=$seqSec%.1f queued3DeleteSec=$queueSec%.1f " +
        f"queued3Docs=$nQ")
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
