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

  test("distributed level-2 training == driver build under the caps; past-cap auto-delegation stays sound") {
    def sameTree(a: Similarity.CentroidTree, b: Similarity.CentroidTree,
                 what: String): Unit = {
      assert(a.coarse.map(_.toSeq).toSeq == b.coarse.map(_.toSeq).toSeq,
        s"$what: coarse levels differ")
      assert(a.childIds.map(_.toSeq).toSeq == b.childIds.map(_.toSeq).toSeq,
        s"$what: child id layouts differ")
      assert(a.childFlat.map(_.toSeq).toSeq == b.childFlat.map(_.toSeq).toSeq,
        s"$what: child centroids differ")
    }
    // defaults resolve to the same 2048-row sample for both faces at
    // this k — the distributed build must be EXACTLY the driver build
    // (same routing arithmetic, same per-cell point order, same
    // occupancy-proportional child counts, same id assembly)
    sameTree(Similarity.hierarchicalCentroidsDistributed(embs, K), tree,
      "defaults")
    // explicit equal sub-cap samples, with spill riding along
    val s = 1200
    sameTree(
      Similarity.hierarchicalCentroidsDistributed(embs, K,
        coarseSampleSize = s, childSampleSize = s, spill = 0.2),
      Similarity.hierarchicalCentroids(embs, K, sampleSize = s, spill = 0.2),
      "explicit sample 1200 + spill")
    // past the 2^18 row cap (8k > 2^18) the driver face auto-delegates
    // to the executor-side build and the tree stays structurally sound
    // on this (much smaller) corpus: dense distinct ids, no childless
    // cell, and every vector still assigns through it
    val big = Similarity.hierarchicalCentroids(embs, 40000)
    assert(big.childIds.flatten.toSet == (0 until big.k).toSet,
      "past-cap tree's global ids are not dense")
    assert(big.childIds.forall(_.nonEmpty),
      "past-cap tree has a childless coarse cell")
    val assigned = Similarity.semanticAssignRouted(embs, big,
      nAssign = 1, nRoute = 1).select("id").distinct().count()
    assert(assigned == N, s"past-cap tree dropped vectors: $assigned of $N")
  }

  // ---- the BORDERLINE regime (the hard case fixed fan-out loses) ----

  private val NB = 20000L
  private val KB = (NB / 128L).toInt // 156 > RoutedClustersThreshold
  private val BORDER_COS = 0.45

  /** Isotropic dim-16 vectors with 2% planted BORDERLINE pairs:
    * member = base + 1.9·noise ⇒ E[cos] ≈ 0.47 — far from the
    * near-copy regime, members route nearly independently. */
  private def genBorderline(n: Long): DataFrame = {
    val base = when(pmod(col("id"), lit(50)) === 0 && col("id") > 0,
      col("id") - 1).otherwise(col("id"))
    val isCopy = col("id") =!= base
    val vec = transform(sequence(lit(0), lit(15)), j =>
      (((pmod(xxhash64(base, j, lit(SEED)), lit(2000L)).cast("double")
        / 1000.0) - 1.0)
        + when(isCopy,
          lit(1.9) * ((pmod(xxhash64(col("id"), j, lit(SEED + 99)), lit(2000L))
            .cast("double") / 1000.0) - 1.0)).otherwise(0.0))
        .cast("float"))
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  private lazy val embsB = genBorderline(NB).localCheckpoint()

  test("spilled tree: round trip lossless, replicas share ids, degeneration to flat still exact") {
    val spill = Similarity.spillFor(BORDER_COS)
    val ts = Similarity.hierarchicalCentroids(embsB, KB, spill = spill)
    assert(ts.slots > ts.k, "borderline spill produced no replicas")
    // distinct ids are still a 0..k-1 permutation; every replica's
    // vector is byte-identical to its home copy (concat collapses)
    assert(ts.childIds.flatten.toSet == (0 until ts.k).toSet,
      "spilled tree's distinct global ids are not 0..k-1")
    val back = Similarity.treeFromDF(Similarity.treeToDF(spark, ts))
    assert(back.childIds.map(_.toSeq).toSeq == ts.childIds.map(_.toSeq).toSeq &&
      back.childFlat.map(_.toSeq).toSeq == ts.childFlat.map(_.toSeq).toSeq,
      "spilled tree drifted through the table round trip")
    // full fan-out over the SPILLED tree still equals flat assignment
    // on the deduplicated concat — the replica dedup keeps the
    // degeneration law intact
    val sub = embsB.where(col("vec_id") < 2000) // degeneration is O(N·k) — law holds per-row
    val routed = Similarity.semanticAssignRouted(sub, ts,
      nAssign = 3, nRoute = ts.coarse.length)
    val flat = Similarity.semanticAssign(sub, ts.concat, nAssign = 3)
    assert(routed.exceptAll(flat).isEmpty && flat.exceptAll(routed).isEmpty,
      "full-fan-out assignment over a spilled tree differs from flat " +
        "(replica dedup broken?)")
  }

  test("borderline floor: auto-routed product config recovers >=80% of flat pairs at ~2 average probes") {
    // the exact configuration semanticNearDupPairs' auto-routed path
    // uses at this threshold (spill + margin from the threshold)
    val spill = Similarity.spillFor(BORDER_COS)
    val margin = Similarity.routeMarginFor(BORDER_COS)
    val ts = Similarity.hierarchicalCentroids(embsB, KB, spill = spill)
    val routedPairs = Similarity.semanticPairsFromIndex(
      Similarity.semanticAssignRoutedAdaptive(embsB, ts, nAssign = 3,
        routeMargin = margin, minRoute = 2, maxRoute = 4),
      BORDER_COS).select("a", "b").localCheckpoint()
    val flatPairs = Similarity.semanticPairsFromIndex(
      Similarity.semanticAssign(embsB, ts.concat, nAssign = 3),
      BORDER_COS).select("a", "b").localCheckpoint()
    val nFlat = flatPairs.count()
    assert(nFlat > 1000, s"borderline fixture too sparse: $nFlat flat pairs")
    val hit = routedPairs.join(flatPairs, Seq("a", "b"), "left_semi").count()
    assert(hit.toDouble >= 0.8 * nFlat,
      s"borderline recall $hit/$nFlat below the 0.8 floor — the " +
        "spill+margin machinery regressed to the fixed-fan-out loss")
    // cost side of the contract: the adaptive fan-out must STAY near
    // 2 probes on average — recall bought by probing everything would
    // be a silent cost regression, not a fix
    val avgProbes = Similarity.routedProbeCounts(embsB, ts, margin,
      minRoute = 2, maxRoute = 4)
      .agg(avg("n_probes")).head().getDouble(0)
    assert(avgProbes <= 2.75,
      f"average probe count $avgProbes%.2f blew past ~2 — margin oversized")
    // and the same config through the PRODUCT face end-to-end
    val product = Similarity.semanticNearDupPairs(embsB, BORDER_COS,
      nClusters = KB, nAssign = 3).select("a", "b")
    val productHit = product.join(flatPairs, Seq("a", "b"), "left_semi").count()
    assert(productHit.toDouble >= 0.8 * nFlat,
      s"product-face borderline recall $productHit/$nFlat below 0.8")
  }
}
