package graft

import graft.ops.{Dedup, Outliers, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical scaling curves — the engine's twin of the reference's
  * HW2 scalability study (BASELINE.md Table 1): run each
  * scale-sensitive pipeline on generated fixtures at 1× and 10× and
  * assert the measured time grows SUB-QUADRATICALLY. Every per-op law
  * elsewhere verifies the design at one scale; this is the one test
  * that catches a hidden N² (a fixed bucket count, an accidental
  * cross join, a driver fold) before a cluster does.
  *
  * Fixture design — "weak scaling", so the TRUE answer grows ~linearly
  * and a superlinear time ratio indicts the implementation, not the
  * problem:
  *  - points: uniform over an area ∝ N (constant density ⇒ constant
  *    neighbors/point, pair count ∝ N);
  *  - documents: 40 seeded-hash tokens from a vocabulary ∝ N (shingle
  *    space grows ⇒ random cross-doc collisions stay negligible) with
  *    a constant 2% planted near-dup rate (pair count ∝ N);
  *  - embeddings: isotropic seeded-hash vectors; bucket counts derive
  *    from N (nBitsFor/nlistFor), holding per-bucket occupancy flat.
  *
  * Bounds: 10× data ⇒ ratio ≤ 20 for the linear-designed pipelines
  * (2× slack on the ideal 10 for constants and scheduler noise);
  * ann_ivf is N^1.5 BY DESIGN (nlist ≈ √(nprobe·N) balances assignment
  * against probe cost — see nlistFor), ideal 31.6×, bound 50. A
  * quadratic regression would measure ~100× on compute-dominated runs
  * and fail every bound.
  *
  * Protocol: each pipeline runs once at 1× as JIT/codegen warmup, then
  * min-of-2 timed runs per scale; 1× denominators are floored at 0.5 s
  * so a lucky sub-100 ms small run can't inflate the ratio past a
  * bound. Fixtures are written to parquet once and read back, so
  * generation cost is never timed and every pipeline starts from a
  * scan like production.
  */
class ScalingSpec extends SparkSpec {

  private val SEED = 42L

  // ---- generators (deterministic: seeded xxhash64, no RNG state) ----

  /** Uniform points, density 4/unit² over a √(N/4)-sided square. */
  private def genPoints(n: Long): DataFrame = {
    val side = math.sqrt(n / 4.0)
    val u = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(1000000L)).cast("double") / 1000000.0
    spark.range(n).select(
      (col("id") + 1L).as("id"),
      (u(xxhash64(col("id"), lit(SEED))) * side).as("x"),
      (u(xxhash64(col("id"), lit(SEED + 1))) * side).as("y"))
  }

  /** 40-token docs over a vocab of n/5 words; ids ≡ 0 (mod 50) are
    * near-copies of id−1 (last token differs ⇒ jaccard ≈ 0.9). */
  private def genDocs(n: Long): DataFrame = {
    val vocab = math.max(1000L, n / 5)
    val base = when(pmod(col("id"), lit(50)) === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    val toks = transform(sequence(lit(0), lit(39)), j =>
      concat(lit("w"), when(j === 39, pmod(xxhash64(col("id"), j, lit(SEED)), lit(vocab)))
        .otherwise(pmod(xxhash64(base, j, lit(SEED)), lit(vocab)))))
    spark.range(n).select(col("id").as("doc_id"),
      array_join(toks, " ").as("text"))
  }

  /** Isotropic dim-16 float vectors, components in [−1, 1). */
  private def genEmbeddings(n: Long): DataFrame = {
    val vec = transform(sequence(lit(0), lit(15)), j =>
      ((pmod(xxhash64(col("id"), j, lit(SEED)), lit(2000L)).cast("double")
        / 1000.0) - 1.0).cast("float"))
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  // ---- harness ----

  private lazy val dir = java.nio.file.Files
    .createTempDirectory("graft_scaling").toString

  private def materialize(name: String, df: DataFrame): String = {
    val path = s"$dir/$name"
    df.write.mode("overwrite").parquet(path)
    path
  }

  private def timed(f: => Unit): Double = {
    // cache cleared after EACH run: the dedup pipelines .cache() their
    // shingle tables, and a second run of the same logical plan would
    // otherwise read the first run's cache and time cache IO, not the
    // pipeline
    def once: Double = {
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      t
    }
    math.min(once, once)
  }

  private case class Run(name: String, t1: Double, t10: Double, bound: Double) {
    def ratio: Double = t10 / math.max(t1, 0.5)
  }

  test("1x->10x: time grows sub-quadratically for every scale-sensitive pipeline") {
    // fixtures (written once; reads below are plain parquet scans)
    val pts1 = materialize("pts1", genPoints(150000))
    val pts10 = materialize("pts10", genPoints(1500000))
    val docs1 = materialize("docs1", genDocs(15000))
    val docs10 = materialize("docs10", genDocs(150000))
    val emb1 = materialize("emb1", genEmbeddings(20000))
    val emb10 = materialize("emb10", genEmbeddings(200000))
    def pts(p: String) = spark.read.parquet(p)
    def docs(p: String) = spark.read.parquet(p)
    def embs(p: String) = spark.read.parquet(p)

    def outlierExact(p: String): Unit =
      Outliers.exactOutliers(pts(p), d = 1.0, m = 10, k = 10).count()
    def minhash(p: String): Unit =
      Dedup.minhashLshPairs(docs(p), 3, 32, 8, 0.3, SEED).count()
    def ngram(p: String): Unit =
      Dedup.ngramJaccardPairs(docs(p), 3, 0.3).count()
    def clusters(p: String): Unit = {
      val d = docs(p)
      val pairs = Dedup.minhashLshPairs(d, 3, 32, 8, 0.3, SEED)
      Dedup.dupClusters(d.select("doc_id"), pairs).count()
    }
    def bucketed(p: String): Unit = {
      val e = embs(p)
      val n = e.count()
      Similarity.annBucketed(e, 1, dim = 16, nBits = Similarity.nBitsFor(n),
        seed = SEED).count()
    }
    def ivf(p: String): Unit = {
      val e = embs(p)
      val n = e.count()
      Similarity.annIvf(e, 1, nlist = Similarity.nlistFor(n), nprobe = 4).count()
    }

    // the planted dups must actually exercise the pair paths
    assert(Dedup.minhashLshPairs(docs(docs1), 3, 32, 8, 0.3, SEED).count() > 0,
      "scaling fixture planted no near-dup pairs")
    spark.sharedState.cacheManager.clearCache()

    def measure(name: String, f: String => Unit, p1: String, p10: String,
                bound: Double): Run = {
      f(p1) // warmup: codegen + JIT for this pipeline's plan shape
      spark.sharedState.cacheManager.clearCache()
      Run(name, timed(f(p1)), timed(f(p10)), bound)
    }

    val runs = Seq(
      measure("outlier_exact", outlierExact, pts1, pts10, 20),
      measure("dedup_minhash", minhash, docs1, docs10, 20),
      measure("dedup_ngram", ngram, docs1, docs10, 20),
      measure("dedup_clusters", clusters, docs1, docs10, 20),
      measure("ann_bucketed", bucketed, emb1, emb10, 20),
      // N^1.5 by design: nlist ≈ √(nprobe·N) — ideal 31.6×
      measure("ann_ivf", ivf, emb1, emb10, 50))

    info(f"${"pipeline"}%-16s ${"t(1x)"}%8s ${"t(10x)"}%8s ${"ratio"}%7s ${"bound"}%6s")
    runs.foreach { r =>
      info(f"${r.name}%-16s ${r.t1}%8.2f ${r.t10}%8.2f ${r.ratio}%7.1f ${r.bound}%6.0f")
    }
    runs.foreach { r =>
      assert(r.ratio <= r.bound,
        f"${r.name}: 10x data took ${r.ratio}%.1fx the 1x time " +
          f"(${r.t1}%.2f s -> ${r.t10}%.2f s; bound ${r.bound}%.0f) — " +
          "superlinear growth beyond the design budget, check for a hidden N^2")
    }
  }
}
