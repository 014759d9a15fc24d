package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure recall@1 of the ANN paths against the exact
  * slice NN — the numbers behind the floors `check_ann_recall` /
  * `check_ivf` assert (distance-based recall, same helper).
  *
  * Usage: runMain graft.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    import graft.queries.{CheckQueries, Tables}

    val embs = Tables.embeddings(spark, sfDir)
    val n = Tables.embeddingsCount(spark, sfDir)
    val nBits = Similarity.nBitsFor(n)
    val nlist = Similarity.nlistFor(n)
    val slice = pmod(col("vec_id"), lit(5)) === 0
    val e = embs.select(col("vec_id").as("eid"), col("embedding").as("v"))
    val ex = Similarity.cosineTopK(embs, 1, queryPred = slice)
      .select(col("vec_id"), col("nn_id").as("nn_e"))

    val bk = Similarity.annBucketed(embs, 1, dim = 64, nBits = nBits, seed = 42L,
      queryPred = slice).select(col("vec_id"), col("nn_id").as("nn_b"))
    val mp = Similarity.annMultiProbe(embs, 1, dim = 64, nBits = nBits, seed = 42L,
      queryPred = slice).select(col("vec_id"), col("nn_id").as("nn_m"))
    val ivf = Similarity.annIvf(embs, 1, nlist = nlist, nprobe = 4)
      .where(slice).select(col("vec_id"), col("nn_id").as("nn_i"))
    // the int8 round-trip path behind check_ann_quantized's floor —
    // recall still scored against the exact NN on the ORIGINAL floats
    val mpq = Similarity.annMultiProbe(
        Similarity.dequantizeInt8(Similarity.quantizeInt8(embs)),
        1, dim = 64, nBits = nBits, seed = 42L, vecCol = "vec",
        queryPred = slice)
      .select(col("vec_id"), col("nn_id").as("nn_q"))
    // the PQ family shares one trained book set (and the IVFADC path
    // one coarse quantizer), like the product queries
    val books = Similarity.pqTrain(embs, m = 8, ksub = 16)
    val cents = Similarity.ivfCentroids(embs, nlist)
    val codes = Similarity.pqEncode(embs, books)
    val adc = Similarity.annPq(embs, 1, queryPred = slice, books = Some(books),
        precomputedCodes = Some(codes))
      .select(col("vec_id"), col("nn_id").as("nn_a"))
    val pqr = Similarity.annPq(embs, 1, rerank = 32, queryPred = slice,
        books = Some(books), precomputedCodes = Some(codes))
      .select(col("vec_id"), col("nn_id").as("nn_r"))
    val ipq = Similarity.annIvfPq(embs, 1, nlist = nlist, nprobe = 4,
        rerank = 32, queryPred = slice,
        centroids = Some(cents), books = Some(books))
      .select(col("vec_id"), col("nn_id").as("nn_v"))

    println(s"RECALL n=$n nBits=$nBits nlist=$nlist")
    for (eps <- Seq(0.0, 0.02, 0.05, 0.10, 0.15, 0.20)) {
      val (hb, nq) = CheckQueries.recallAt1(e, ex, bk, "nn_b", eps)
      val (hm, _) = CheckQueries.recallAt1(e, ex, mp, "nn_m", eps)
      val (hi, _) = CheckQueries.recallAt1(e, ex, ivf, "nn_i", eps)
      val (hq, _) = CheckQueries.recallAt1(e, ex, mpq, "nn_q", eps)
      val (ha, _) = CheckQueries.recallAt1(e, ex, adc, "nn_a", eps)
      val (hr, _) = CheckQueries.recallAt1(e, ex, pqr, "nn_r", eps)
      val (hv, _) = CheckQueries.recallAt1(e, ex, ipq, "nn_v", eps)
      println(f"RECALL eps=$eps%.2f bucketed ${hb.toDouble / nq}%.3f " +
        f"multiprobe ${hm.toDouble / nq}%.3f ivf ${hi.toDouble / nq}%.3f " +
        f"quantized_mp ${hq.toDouble / nq}%.3f pq_adc ${ha.toDouble / nq}%.3f " +
        f"pq_rerank ${hr.toDouble / nq}%.3f ivfadc ${hv.toDouble / nq}%.3f (n=$nq)")
    }
    // recall@3 of the top-k (rank window) paths — the numbers behind
    // the bucketed/multiprobe/ivf *_recall_at3 floors
    val ex3 = Similarity.cosineTopK(embs, 3, queryPred = slice)
      .select("vec_id", "nn_id").cache()
    val bk3 = Similarity.annBucketed(embs, 3, dim = 64, nBits = nBits, seed = 42L,
      queryPred = slice).select("vec_id", "nn_id")
    val mp3 = Similarity.annMultiProbe(embs, 3, dim = 64, nBits = nBits, seed = 42L,
      queryPred = slice).select("vec_id", "nn_id")
    val ivf3 = Similarity.annIvf(embs, 3, nlist = nlist, nprobe = 4,
      queryPred = slice).select("vec_id", "nn_id")
    for (eps <- Seq(0.0, 0.05, 0.10, 0.15, 0.20)) {
      val (hb3, s3) = CheckQueries.recallAtK(e, ex3, bk3, eps)
      val (h3, _) = CheckQueries.recallAtK(e, ex3, mp3, eps)
      val (hi3, _) = CheckQueries.recallAtK(e, ex3, ivf3, eps)
      println(f"RECALL@3 eps=$eps%.2f bucketed ${hb3.toDouble / s3}%.3f " +
        f"multiprobe ${h3.toDouble / s3}%.3f " +
        f"ivf ${hi3.toDouble / s3}%.3f (slots=$s3)")
    }
    // the floors as shipped: both checks must report zero violations
    for (name <- Seq("check_ann_recall", "check_ivf", "check_ann_quantized")) {
      val viol = SparkEntry.queries(name)(spark, sfDir).collect()
      println(s"RECALL $name violations=${viol.length}" +
        (if (viol.nonEmpty) " " + viol.mkString(";") else ""))
    }
    spark.stop()
  }
}
