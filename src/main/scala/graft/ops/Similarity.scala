package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and an LSH/IVF-
  * bucketed variant as the scale path.
  *
  * Dot products / norms are higher-order array expressions
  * (`zip_with` + `aggregate`) over the embedding arrays, cast to
  * double — no UDFs, stays in codegen.
  *
  * Scale notes: brute force is O(N²·dim) — the verifier. The bucketed
  * variant assigns each vector to a coarse cell (random-hyperplane
  * sign bits — seeded, data-independent, no training step) and joins
  * only within cells: cost ∝ Σ cell²; probing multiple cells trades
  * recall for cost. On a cluster both sides shuffle on the bucket key.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors per vector (brute force, id-ordered
    * tie-break): `vec_id, nn_id, rank`. */
  def cosineTopK(embs: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = embs.select(col(idCol).as("vec_id"), col(vecCol).as("va"))
    val r = embs.select(col(idCol).as("nn_id"), col(vecCol).as("vb"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn_id"))
    l.join(r, col("vec_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nn_id"), col("rank"))
  }

  /** Random-hyperplane bucket id: `nBits` sign bits of projections
    * onto seeded pseudo-random hyperplanes. The hyperplane components
    * are derived from xxhash64(dim_index, bit, seed) — deterministic,
    * no training, identical on every executor. */
  def rpBucket(vec: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val bits = (0 until nBits).map { b =>
      // projection = Σ_i v_i * h(i,b)  with h ∈ [-0.5, 0.5)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(i, lit(b), lit(seed)), lit(1L << 32)).cast("double")
              / lit((1L << 32).toDouble) - lit(0.5))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate NN via random-hyperplane buckets: joins only within
    * buckets; `vec_id, nn_id, rank` (rank within bucket). Vectors in
    * singleton buckets produce no rows (trade-off of the scale path —
    * standard for LSH without multi-probe). */
  def annBucketed(embs: DataFrame, k: Int, dim: Int, nBits: Int, seed: Long = 42L,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      rpBucket(col(vecCol), dim, nBits, seed).as("bucket"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn_id"))
    b.as("l").join(b.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") =!= col("r.id"))
      .select(col("l.id").as("vec_id"), col("r.id").as("nn_id"),
        cosine(col("l.v"), col("r.v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("nn_id"), col("rank"))
  }
}
