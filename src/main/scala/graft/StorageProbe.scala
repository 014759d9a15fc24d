package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure the ON-DISK footprint of the maintained
  * embedding-index tables under the slim-storage discipline (round
  * 14) against the pre-slim layout — the numbers behind SCALING.md's
  * "each index byte stored once" claim.
  *
  * Bootstraps an ann-enabled ingest root over the fixture embeddings
  * (the same shape as `check_ingest_ann_replay`), then reports parquet
  * bytes per table, plus the FAT twins written to scratch: the full
  * `ivfAssign` output (assignment rows carrying the unit vector, the
  * pre-round-14 `ivf` table) and the full `pqEncode` output (with the
  * widened `codes_arr` ints). One JSON line.
  *
  * Usage: `runMain graft.StorageProbe [sfDir]`
  * (default /root/testdata/sf0.01). Honors `SPARK_GRAFT_CPUS`.
  */
object StorageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    import graft.queries.Tables
    import graft.streaming.ContinuousIngest
    import graft.streaming.ContinuousIngest.{AnnParams, IngestParams, IngestState}

    val n = Tables.embeddingsCount(spark, sfDir)
    val docs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"),
        concat(lit("v"), col("vec_id")).as("text"), col("embedding"))
    val dim = docs.select(size(col("embedding"))).limit(1).collect().head.getInt(0)
    val nlist = Similarity.nlistFor(n)
    val p = IngestParams(expectedDigests = math.max(1L, n), fpp = 0.05,
      nearDup = false, ann = Some(AnnParams(nlist = nlist)))
    val root = java.nio.file.Files.createTempDirectory("graft_storage_probe")
    def rmTree(d: java.nio.file.Path): Unit = {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(d).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () }
    }
    try {
      val st = IngestState(root.toString)
      ContinuousIngest.bootstrap(docs, st, p)
      val q = ContinuousIngest.loadQuantizers(spark, st, p.ann.get)
      def bytes(path: String): Long = {
        val f = new java.io.File(path)
        if (!f.exists()) 0L
        else if (f.isFile) f.length()
        else f.listFiles().map(c => bytes(c.getPath)).sum
      }
      // the fat twins the slim discipline replaced, written to scratch
      val fatDir = java.nio.file.Files.createTempDirectory("graft_storage_fat")
      Similarity.ivfAssign(docs, q.cents, idCol = "doc_id")
        .write.mode("overwrite").parquet(s"$fatDir/ivf_fat")
      Similarity.pqEncode(docs, q.books, idCol = "doc_id")
        .write.mode("overwrite").parquet(s"$fatDir/pq_fat")
      // the FLOAT-ONCE twin (storeEmbeddingsInDocs = false): same
      // corpus, docs table without the embedding column — the
      // round-15 layout that removes the docs/packed float duplication
      val slimRoot = java.nio.file.Files.createTempDirectory("graft_storage_slim")
      val stSlim = IngestState(slimRoot.toString)
      ContinuousIngest.bootstrap(docs, stSlim,
        p.copy(storeEmbeddingsInDocs = false))
      val out = Map[String, Long](
        "n" -> n, "dim" -> dim.toLong, "nlist" -> nlist.toLong,
        "docs" -> bytes(st.docsPath),
        "docs_noemb" -> bytes(stSlim.docsPath),
        "ivf_slim" -> bytes(st.ivfPath),
        "ivf_fat" -> bytes(s"$fatDir/ivf_fat"),
        "ivf_packed" -> bytes(st.ivfPackedPath),
        "pq_slim" -> bytes(st.pqPath),
        "pq_fat" -> bytes(s"$fatDir/pq_fat"),
        "pq_packed" -> bytes(st.pqPackedPath))
      val slimTotal = out("ivf_slim") + out("ivf_packed") + out("pq_slim") +
        out("pq_packed")
      val fatTotal = out("ivf_fat") + out("ivf_packed") + out("pq_fat")
      // corpus + index bytes under the three layouts: pre-slim-index
      // (fat assignment + docs), slim-index (round 14), float-once
      // docs (round 15)
      val totalFatIdx = out("docs") + fatTotal
      val totalR14 = out("docs") + slimTotal
      val totalR15 = out("docs_noemb") + slimTotal
      println((out.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" } ++
        Seq(s""""index_slim_total":$slimTotal""",
            s""""index_fat_total":$fatTotal""",
            f""""slim_over_fat":${slimTotal.toDouble / fatTotal}%.3f""",
            s""""corpus_index_fat":$totalFatIdx""",
            s""""corpus_index_r14":$totalR14""",
            s""""corpus_index_floatonce":$totalR15""",
            f""""floatonce_over_r14":${totalR15.toDouble / totalR14}%.3f"""))
        .mkString("{", ",", "}"))
      rmTree(fatDir)
      rmTree(slimRoot)
    } finally {
      rmTree(root)
    }
    spark.stop()
  }
}
