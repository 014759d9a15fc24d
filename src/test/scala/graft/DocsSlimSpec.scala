package graft

import graft.ops.Similarity
import graft.streaming.ContinuousIngest
import graft.streaming.ContinuousIngest.{AnnParams, IngestParams, IngestState}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The FLOAT-ONCE storage layout
  * (`IngestParams.storeEmbeddingsInDocs = false`): the docs table
  * drops the embedding column and the packed index segments become
  * the corpus's only float store. Pins:
  *
  *  - equivalence with the embedding-carrying twin: identical index
  *    tables, identical ANN answers (the slim root's reranks gather
  *    from the packed segments automatically), identical dedup
  *    decisions and accounting — the layout changes bytes, never
  *    answers;
  *  - replay idempotence through the hidden survivor stage;
  *  - the layout-drift guard (mismatched IngestParams refused);
  *  - `rebuildIndexes` reconstructs the training corpus via
  *    `reconstructEmbeddings` — id-level equality (cell assignments,
  *    codes, top-k answers) with the fat twin's rebuild, the honest
  *    bar under the documented float-width cast;
  *  - tombstone deletes purge a float-once root end-to-end (they
  *    never needed docs floats or text on a V2 root).
  */
class DocsSlimSpec extends SparkSpec {
  import spark.implicits._

  private val ann = AnnParams(nlist = 4, m = 4, ksub = 4, nAssign = 2,
    semClusters = Some(6))
  private val Pfat = IngestParams(expectedDigests = 10000L, fpp = 0.1,
    minJaccard = 0.5, seed = 42L, ann = Some(ann))
  private val Pslim = Pfat.copy(storeEmbeddingsInDocs = false)

  private def text(i: Long): String =
    (0 until 40).map(j => s"w${31 * i + j}").mkString(" ")

  private def emb(i: Long): Seq[Float] =
    (0 until 16).map(j => ((((31 * i + 7 * j) % 21) - 10) / 10.0).toFloat)

  private def freshRoot(): java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_docslim")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () }
    }
    root
  }

  private def batchDf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, text(i), emb(i))).toDF("doc_id", "text", "embedding")

  /** Bootstrap 30 docs + two batches (with one near-dup drop path:
    * 2003 shares 2002's text) under the given params. */
  private def build(root: String, p: IngestParams): IngestState = {
    val st = IngestState(root)
    ContinuousIngest.bootstrap(batchDf(1001L to 1030L), st, p)
    val quant = ContinuousIngest.loadQuantizers(spark, st, ann)
    ContinuousIngest.ingestBatch(batchDf(2001L to 2010L), 0L, st, p, Some(quant))
    ContinuousIngest.ingestBatch(
      batchDf(3001L to 3005L).unionByName(
        Seq((3006L, text(2002L), emb(3006L)))
          .toDF("doc_id", "text", "embedding")),
      1L, st, p, Some(quant))
    st
  }

  private def assertSame(name: String, a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$name: differs between the layouts")

  test("float-once root: no embedding column in docs, identical index tables and ANN answers; drift guard; replay") {
    val root = freshRoot()
    val stF = build(s"$root/fat", Pfat)
    val stS = build(s"$root/slim", Pslim)
    // the layout: no embedding column, marker present
    val slimCols = ContinuousIngest.readTable(spark, stS.docsPath).columns.toSet
    assert(!slimCols.contains("embedding"), s"slim docs columns: $slimCols")
    assert(new java.io.File(s"${stS.docsPath}/_GRAFT_DOCS_SLIM").exists())
    assert(ContinuousIngest.docsSlim(spark, stS) &&
      !ContinuousIngest.docsSlim(spark, stF))
    // identical dedup outcome (same survivor ids — 3006 dropped) and
    // identical index tables: the layout never changes a decision
    assertSame("docs ids",
      ContinuousIngest.readTable(spark, stS.docsPath).select("doc_id"),
      ContinuousIngest.readTable(spark, stF.docsPath).select("doc_id"))
    assert(ContinuousIngest.readTable(spark, stS.docsPath)
      .where(col("doc_id") === 3006L).count() === 0L, "near-dup not dropped")
    Seq("ivf" -> stS.ivfPath -> stF.ivfPath, "pq" -> stS.pqPath -> stF.pqPath,
      "sem" -> stS.semPath -> stF.semPath).foreach {
      case ((name, sp), fp) =>
        assertSame(name, ContinuousIngest.readTable(spark, sp),
          ContinuousIngest.readTable(spark, fp))
    }
    assertSame("ivf_packed",
      Similarity.ivfUnpack(ContinuousIngest.readTable(spark, stS.ivfPackedPath)),
      Similarity.ivfUnpack(ContinuousIngest.readTable(spark, stF.ivfPackedPath)))
    // ANN answers: exact IVF and the IVFADC rerank face — the slim
    // root's rerank auto-switches to the packed gather, byte-identical
    val quant = Some(ContinuousIngest.loadQuantizers(spark, stS, ann))
    val queries = batchDf(Seq(9001L, 9002L, 9003L))
      .select("doc_id", "embedding")
    assertSame("exact ANN",
      ContinuousIngest.annIvfMaintained(spark, stS, ann, queries,
        k = 3, nprobe = 2, quant, excludeSelf = false),
      ContinuousIngest.annIvfMaintained(spark, stF, ann, queries,
        k = 3, nprobe = 2, quant, excludeSelf = false))
    assertSame("IVFADC rerank",
      ContinuousIngest.annIvfPqMaintained(spark, stS, ann, queries,
        k = 3, nprobe = 2, rerank = 8, quant, excludeSelf = false),
      ContinuousIngest.annIvfPqMaintained(spark, stF, ann, queries,
        k = 3, nprobe = 2, rerank = 8, quant, excludeSelf = false))
    // filtered IVFADC too (auto-switched to the index-only tier)
    val elig = ContinuousIngest.readTable(spark, stS.docsPath)
      .where(col("doc_id") % 2 === 0).select("doc_id")
    assertSame("filtered IVFADC",
      ContinuousIngest.annIvfPqFilteredMaintained(spark, stS, ann, queries,
        k = 3, nprobe = 2, elig, rerank = 8, quantizers = quant,
        excludeSelf = false),
      ContinuousIngest.annIvfPqFilteredMaintained(spark, stF, ann, queries,
        k = 3, nprobe = 2, elig, rerank = 8, quantizers = quant,
        excludeSelf = false))
    // accounting identical (stats flow from the staged survivors)
    assert(ContinuousIngest.readStats(spark, stS).collect().toSeq ===
      ContinuousIngest.readStats(spark, stF).collect().toSeq)
    // replay idempotence through the hidden stage: re-deliver batch 1
    // binary columns (pq codes) stringify by ARRAY IDENTITY under
    // Row.mkString — render them by value or the comparison is noise
    def snap(st: IngestState): Seq[Set[String]] =
      Seq(st.docsPath, st.digestsPath, st.ivfPath, st.pqPath, st.semPath)
        .map(p => ContinuousIngest.readTable(spark, p)
          .collect().map(_.toSeq.map {
            case b: Array[Byte] => b.mkString(",")
            case x => x
          }.mkString("|")).toSet)
    val before = snap(stS)
    ContinuousIngest.ingestBatch(
      batchDf(3001L to 3005L).unionByName(
        Seq((3006L, text(2002L), emb(3006L)))
          .toDF("doc_id", "text", "embedding")),
      1L, stS, Pslim, quant)
    assert(snap(stS) === before, "slim replay changed state")
    // no stage leftovers after a clean batch
    assert(!new java.io.File(stS.docsPath).listFiles()
      .exists(_.getName.startsWith(".ingest_stage_batch=")),
      "survivor stage not cleaned up")
    // the layout-drift guard, both directions
    val eS = intercept[Throwable] {
      ContinuousIngest.ingestBatch(batchDf(Seq(4001L)), 2L, stS, Pfat, quant)
    }
    assert(msgs(eS).exists(_.contains("docs-layout drift")), s"${msgs(eS)}")
    val eF = intercept[Throwable] {
      ContinuousIngest.ingestBatch(batchDf(Seq(4001L)), 2L, stF, Pslim, quant)
    }
    assert(msgs(eF).exists(_.contains("docs-layout drift")), s"${msgs(eF)}")
  }

  test("rebuildIndexes on a float-once root: reconstructed corpus, id-level equality with the fat twin's rebuild") {
    val root = freshRoot()
    val stF = build(s"$root/fat", Pfat)
    val stS = build(s"$root/slim", Pslim)
    // reconstruction: one row per doc, unit vectors (the stored
    // normalized doubles, cast to the corpus float width)
    val recon = ContinuousIngest.reconstructEmbeddings(spark, stS, ann)
    assertSame("reconstructed id set", recon.select("doc_id"),
      ContinuousIngest.readTable(spark, stS.docsPath).select("doc_id"))
    val norms = recon.select(sqrt(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x * x)).as("n")).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5),
      s"reconstructed vectors must be unit: ${norms.take(3).toSeq}")
    val q2F = ContinuousIngest.rebuildIndexes(spark, stF, ann)
    val q2S = ContinuousIngest.rebuildIndexes(spark, stS, ann)
    // id-level equality: same cell assignments, same codes, same
    // semantic cells (float BYTES of the retrained quantizers may
    // differ in final ulps under the documented cast — ids may not)
    assertSame("rebuilt ivf assignments",
      ContinuousIngest.readTable(spark, stS.ivfPath),
      ContinuousIngest.readTable(spark, stF.ivfPath))
    assertSame("rebuilt pq codes",
      ContinuousIngest.readTable(spark, stS.pqPath).select("vec_id", "codes"),
      ContinuousIngest.readTable(spark, stF.pqPath).select("vec_id", "codes"))
    assertSame("rebuilt sem cells",
      ContinuousIngest.readTable(spark, stS.semPath).select("id", "cluster"),
      ContinuousIngest.readTable(spark, stF.semPath).select("id", "cluster"))
    // answers over the rebuilt roots agree at the id level
    val queries = batchDf(Seq(9001L, 9002L, 9003L)).select("doc_id", "embedding")
    assertSame("post-rebuild IVFADC",
      ContinuousIngest.annIvfPqMaintained(spark, stS, ann, queries,
        k = 3, nprobe = 2, rerank = 8, Some(q2S), excludeSelf = false),
      ContinuousIngest.annIvfPqMaintained(spark, stF, ann, queries,
        k = 3, nprobe = 2, rerank = 8, Some(q2F), excludeSelf = false))
    // the lifecycle continues on the rebuilt slim root: append under
    // the new quantizers, replay idempotent
    ContinuousIngest.ingestBatch(batchDf(5001L to 5004L), 2L, stS, Pslim,
      Some(q2S))
    val before = ContinuousIngest.readTable(spark, stS.ivfPath)
      .collect().map(_.mkString("|")).toSet
    ContinuousIngest.ingestBatch(batchDf(5001L to 5004L), 2L, stS, Pslim,
      Some(q2S))
    assert(ContinuousIngest.readTable(spark, stS.ivfPath)
      .collect().map(_.mkString("|")).toSet === before,
      "post-rebuild slim replay changed the assignment table")
  }

  test("compactState on a float-once root: layout marker survives, answers preserved, lifecycle continues") {
    val root = freshRoot()
    val stS = build(s"$root/slim", Pslim)
    val quant = Some(ContinuousIngest.loadQuantizers(spark, stS, ann))
    val queries = batchDf(Seq(9001L, 9002L)).select("doc_id", "embedding")
    def answers(): DataFrame =
      ContinuousIngest.annIvfPqMaintained(spark, stS, ann, queries,
        k = 3, nprobe = 2, rerank = 8, quant, excludeSelf = false)
    val pre = answers().localCheckpoint()
    ContinuousIngest.compactState(spark, stS, 1L)
    // the marker is a root-level file — consolidation must not drop it
    assert(ContinuousIngest.docsSlim(spark, stS),
      "slim layout marker lost by compaction")
    assertSame("post-compaction ANN answers", answers(), pre)
    assert(!ContinuousIngest.readTable(spark, stS.docsPath)
      .columns.contains("embedding"), "embedding column appeared")
    // the lifecycle continues on the compacted root (the layout guard
    // still reads slim)
    ContinuousIngest.ingestBatch(batchDf(6001L to 6003L), 2L, stS, Pslim, quant)
    assert(ContinuousIngest.readTable(spark, stS.docsPath)
      .where(col("doc_id").isin(6001L, 6002L, 6003L)).count() === 3L)
  }

  test("tombstone delete purges a float-once root; accounting from captured factors") {
    val root = freshRoot()
    val stS = build(s"$root/slim", Pslim)
    val del = Seq(1003L, 2004L, 3002L)
    val pre = ContinuousIngest.readStats(spark, stS)
      .as[(Long, Long, Long)].head()
    val n = ContinuousIngest.deleteDocs(spark, stS, del.toDF("doc_id"))
    assert(n === del.size.toLong)
    Seq(stS.docsPath -> "doc_id", stS.ivfPath -> "nn_id",
      stS.pqPath -> "vec_id", stS.semPath -> "id").foreach {
      case (p, c) =>
        assert(ContinuousIngest.readTable(spark, p)
          .where(col(c).isin(del: _*)).count() === 0L, s"$p leaked")
    }
    val post = ContinuousIngest.readStats(spark, stS)
      .as[(Long, Long, Long)].head()
    assert(post._1 === pre._1 - del.size,
      s"float-once delete accounting: $post vs $pre")
    // re-ingest of a deleted doc's text admits again (digest gone)
    val back = ContinuousIngest.ingestBatch(batchDf(Seq(1003L)), 2L, stS, Pslim)
      .count()
    assert(back === 1L, "deleted content must re-admit on the slim root")
  }
}
