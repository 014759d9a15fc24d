package graft

import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the two-level quantizer ([[Similarity.hierarchicalCentroids]])
  * and its routed spill assignment ([[Similarity.semanticAssignRouted]])
  * — the N^1.5 scale face of semantic dedup:
  *
  *  - tree shape: global cluster ids are 0..k'-1 exactly once, child
  *    flats carry dim doubles per child, and the total child count is
  *    within rounding of the requested k;
  *  - full-route degeneration: with nRoute = #coarse cells the routed
  *    assignment equals flat [[Similarity.semanticAssign]] against
  *    `tree.concat` EXACTLY (every child considered once, identical
  *    (dot desc, global-id asc) tie-break) — the routing machinery
  *    loses nothing given full fan-out, so any partial-route loss is
  *    the documented probe trade, not a bug;
  *  - planted recall: with nRoute = 2, the routed semantic pairs must
  *    recover ≥ 90% of the pairs the full-route (= flat) face finds
  *    on a corpus with planted near-copies, and must find ≥ 90% of
  *    the planted pairs themselves — the spill-vs-recall floor;
  *  - soundness is structural (pairs are scored by exact cosine
  *    within shared cells — same downstream machinery as the flat
  *    face, already law-gated by check_semantic_dedup).
  */
class RoutedAssignSpec extends SparkSpec {

  private val SEED = 42L
  private val N = 4000L
  private val K = 120 // > RoutedClustersThreshold, ≫ √k coarse cells

  /** Isotropic dim-16 vectors; ids ≡ 0 (mod 40) are near-copies of
    * id−1 (one component nudged ⇒ cosine ≈ 0.998). */
  private def genPlanted(n: Long): DataFrame = {
    val base = when(pmod(col("id"), lit(40)) === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    val vec = transform(sequence(lit(0), lit(15)), j =>
      (((pmod(xxhash64(base, j, lit(SEED)), lit(2000L)).cast("double")
        / 1000.0) - 1.0)
        + when(col("id") =!= base && j === 0, 0.05).otherwise(0.0))
        .cast("float"))
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  private lazy val embs = genPlanted(N).localCheckpoint()
  private lazy val tree = Similarity.hierarchicalCentroids(embs, K)

  test("tree shape: ids are a 0..k'-1 permutation, flats are dim-consistent, k' ≈ k") {
    val ids = tree.childIds.flatten
    assert(ids.sorted.toSeq == (0 until tree.k).toSeq,
      "global cluster ids are not 0..k'-1 exactly once")
    val dim = tree.coarse.head.length
    tree.childIds.zip(tree.childFlat).foreach { case (cids, flat) =>
      assert(flat.length == cids.length * dim,
        s"child flat length ${flat.length} != ${cids.length} children × $dim dims")
    }
    // per-cell rounding can drift the total by at most #cells
    assert(math.abs(tree.k - K) <= tree.coarse.length,
      s"total children ${tree.k} too far from requested $K")
    // ≤: empty coarse cells (duplicate sample points chosen twice by
    // the FFT) are pruned at build — see hierarchicalCentroids
    assert(tree.coarse.length >= 1 &&
      tree.coarse.length <= math.ceil(math.sqrt(K)).toInt,
      s"${tree.coarse.length} coarse cells for k=$K")
    assert(tree.childIds.forall(_.nonEmpty),
      "tree-build invariant broken: a coarse cell has no children")
  }

  test("tree table round trip is lossless (treeToDF -> treeFromDF)") {
    val back = Similarity.treeFromDF(Similarity.treeToDF(spark, tree))
    assert(back.coarse.map(_.toSeq).toSeq == tree.coarse.map(_.toSeq).toSeq,
      "coarse centroids drifted through the table round trip")
    assert(back.childIds.map(_.toSeq).toSeq == tree.childIds.map(_.toSeq).toSeq,
      "child ids drifted through the table round trip")
    assert(back.childFlat.map(_.toSeq).toSeq == tree.childFlat.map(_.toSeq).toSeq,
      "child centroids drifted through the table round trip")
  }

  test("full-route degeneration: nRoute = #coarse equals flat assignment on tree.concat") {
    val routed = Similarity.semanticAssignRouted(embs, tree,
      nAssign = 3, nRoute = tree.coarse.length)
    val flat = Similarity.semanticAssign(embs, tree.concat, nAssign = 3)
    assert(routed.exceptAll(flat).isEmpty && flat.exceptAll(routed).isEmpty,
      "full-fan-out routed assignment differs from the flat assignment " +
        "over the same (concatenated) centroids")
  }

  test("planted recall: nRoute=2 routed pairs recover >=90% of the flat face's and of the planted pairs") {
    val minCos = 0.9
    val routedPairs = Similarity.semanticPairsFromIndex(
      Similarity.semanticAssignRouted(embs, tree, nAssign = 3, nRoute = 2),
      minCos).select("a", "b").localCheckpoint()
    val flatPairs = Similarity.semanticPairsFromIndex(
      Similarity.semanticAssign(embs, tree.concat, nAssign = 3),
      minCos).select("a", "b").localCheckpoint()
    val nFlat = flatPairs.count()
    assert(nFlat > 0, "fixture planted no pairs at the flat face")
    val hit = routedPairs.join(flatPairs, Seq("a", "b"), "left_semi").count()
    assert(hit.toDouble >= 0.9 * nFlat,
      s"routed face found $hit of $nFlat flat-face pairs — routing " +
        "drops boundary clusters beyond the documented trade")
    // planted near-copies: (id-1, id) for id ≡ 0 mod 40
    val planted = embs.where(pmod(col("vec_id"), lit(40)) === 0 && col("vec_id") > 0)
      .select((col("vec_id") - 1).as("a"), col("vec_id").as("b"))
    val nPlanted = planted.count()
    val plantedHit = routedPairs.join(planted, Seq("a", "b"), "left_semi").count()
    assert(plantedHit.toDouble >= 0.9 * nPlanted,
      s"routed face found $plantedHit of $nPlanted planted near-copy pairs")
  }
}
