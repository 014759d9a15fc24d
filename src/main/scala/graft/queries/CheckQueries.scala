package graft.queries

import graft.ops.{Dedup, Fft, Freq, Outliers, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-verifying invariant queries for the operators whose OUTPUT is
  * not SQL-expressible (seeded sampling, LSH, FFT): each emits one row
  * per violated law and is empty when healthy, so the DuckDB oracle is
  * simply the empty set — the driver's hash compare then actively
  * verifies the algorithm's contract instead of a weaker rows-only
  * check. (Laws mirror the reference's own cross-validation: HW1 runs
  * exact AND approximate and the counts must bracket,
  * `HWK_1/G029HW1.py:155-170`; HW3 annotates estimates against the
  * exact histogram, `HWK_3/G029HW3.py:140-156`.)
  */
object CheckQueries extends QueryPack {
  private val SEED = 42L
  private val emptyOracle = "SELECT CAST(NULL AS VARCHAR) AS violation WHERE 1 = 0"

  private def items(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_id").as("ord"), col("user_id").as("item"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // St5 laws: |sample| == min(m, n) and sample ⊆ stream
    "check_reservoir" -> ((s, d) => {
      val it = items(s, d)
      val m = 50
      val n = it.count()
      val sample = Freq.reservoirSample(it, m, SEED)
      val sizeViol = sample.agg(count(lit(1)).as("c"))
        .where(col("c") =!= lit(math.min(m.toLong, n)))
        .select(lit("size_law").as("violation"))
      val memberViol = sample.join(it, Seq("ord", "item"), "left_anti")
        .select(lit("membership").as("violation"))
      sizeViol.union(memberViol)
    }),
    // St6 laws: every sticky count is 1 ≤ cnt ≤ true frequency
    "check_sticky" -> ((s, d) => {
      val it = items(s, d)
      val n = it.count()
      val p = math.min(1.0, Freq.stickyRate(0.0075, 0.0025, 0.1) / n)
      val sticky = Freq.stickySample(it, p, SEED)
      sticky.join(Freq.histogram(it).withColumnRenamed("cnt", "true_cnt"), Seq("item"))
        .where(col("cnt") < 1 || col("cnt") > col("true_cnt"))
        .select(lit("sub_histogram").as("violation"))
    }),
    // LSH soundness: every MinHash pair (jac ≥ 0.3) must appear among
    // the exact n-gram pairs at the looser 0.1 threshold
    "check_minhash_subset" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lsh = Dedup.minhashLshPairs(docs, 3, 32, 8, 0.3, SEED).select("a", "b")
      val exact = Dedup.ngramJaccardPairs(docs, 3, 0.1).select("a", "b")
      lsh.join(exact, Seq("a", "b"), "left_anti")
        .select(lit("lsh_not_in_exact").as("violation"))
    }),
    // FFT law: radius is non-increasing in K. Checked on NESTED
    // prefixes of ONE greedy run (Gonzalez centers are greedy-nested:
    // seqFFT(c, 8) == seqFFT(c, 16).take(8) over the same coreset), so
    // monotonicity is a theorem — centers(K=8) and centers(K=16) from
    // separate per-partition corsets are NOT nested and could
    // false-fail on unlucky data.
    "check_fft_monotone" -> ((s, d) => {
      val pts = Tables.points(s, d)
      val cs16 = Fft.centers(pts, 16, 16)
      val r8 = Fft.radius(pts, cs16.take(8))
      val r16 = Fft.radius(pts, cs16)
      val viol = if (r16 <= r8 + 1e-12) Seq.empty[String] else Seq("radius_monotone")
      import s.implicits._
      viol.toDF("violation")
    }),
    // ANN laws (same parameters as the ann_* driver queries, k=1):
    //  - coverage: multi-probe probes a superset of plain LSH's
    //    buckets, so every vec_id with a bucketed answer has a
    //    multi-probe answer;
    //  - dominance: the multi-probe nn is chosen from a candidate
    //    superset, so its cosine is ≥ the bucketed nn's cosine;
    //  - sanity: no self-pairs.
    "check_ann_recall" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val bk = Similarity.annBucketed(embs, 1, dim = 64, nBits = 4, seed = SEED)
        .select(col("vec_id"), col("nn_id").as("nn_b"))
      val mp = Similarity.annMultiProbe(embs, 1, dim = 64, nBits = 4, seed = SEED)
        .select(col("vec_id"), col("nn_id").as("nn_m"))
      val e = embs.select(col("vec_id").as("eid"), col("embedding").as("v"))
      val coverViol = bk.join(mp, Seq("vec_id"), "left_anti")
        .select(lit("multiprobe_coverage").as("violation"))
      val domViol = bk.join(mp, "vec_id")
        .join(e.withColumnRenamed("eid", "vec_id").withColumnRenamed("v", "vq"), "vec_id")
        .join(e.withColumnRenamed("eid", "nn_b").withColumnRenamed("v", "vb"), "nn_b")
        .join(e.withColumnRenamed("eid", "nn_m").withColumnRenamed("v", "vm"), "nn_m")
        .where(Similarity.cosine(col("vq"), col("vm"))
          < Similarity.cosine(col("vq"), col("vb")) - 1e-9)
        .select(lit("multiprobe_dominance").as("violation"))
      val selfViol = bk.where(col("vec_id") === col("nn_b"))
        .select(lit("self_pair").as("violation"))
        .unionByName(mp.where(col("vec_id") === col("nn_m"))
          .select(lit("self_pair").as("violation")))
      coverViol.unionByName(domViol).unionByName(selfViol)
    }),
    // k-center law: for every SAMPLED vector (the FFT traversed exactly
    // those), assignment distance ≤ the sample's k-center radius,
    // recomputed independently on the driver; clusters are in [0, k);
    // every sampled id is assigned.
    "check_kcenter_assign" -> ((s, d) => {
      val embs = Tables.embeddings(s, d)
      val k = 8
      val assign = Similarity.kcenterAssign(embs, k)
      val (ids, r) = Similarity.kcenterSampleRadius(embs, k)
      import s.implicits._
      val idDf = ids.toSeq.toDF("vec_id")
      val sampled = assign.join(broadcast(idDf), "vec_id")
      val radiusViol = sampled
        .where(col("cdist") > r + 2e-6) // 1e-6 rounding + FP slack
        .select(lit("kcenter_radius").as("violation"))
      val rangeViol = assign
        .where(col("cluster") < 0 || col("cluster") >= k)
        .select(lit("cluster_range").as("violation"))
      val missViol = broadcast(idDf).join(assign, Seq("vec_id"), "left_anti")
        .select(lit("sample_unassigned").as("violation"))
      radiusViol.unionByName(rangeViol).unionByName(missViol)
    }),
    // SimHash laws: (1) the distributed 64-vote aggregate equals the
    // per-row fold twin on a deterministic subset of docs (two
    // independent formulations of the same bits); (2) every reported
    // near-dup pair's Hamming distance, recomputed from signatures,
    // matches the reported dist and is ≤ 3.
    "check_simhash_sound" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sigs = Dedup.simhashSignatures(docs, SEED)
      val twin = docs.where(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id").as("id"), Dedup.simhash64(col("text"), SEED).as("sig2"))
      val twinViol = twin.join(sigs, "id")
        .where(col("sig") =!= col("sig2"))
        .select(lit("simhash_twin").as("violation"))
      val pairs = Dedup.simhashPairs(docs, maxDist = 3, seed = SEED)
      val soundViol = pairs
        .join(sigs.select(col("id").as("a"), col("sig").as("siga")), "a")
        .join(sigs.select(col("id").as("b"), col("sig").as("sigb")), "b")
        .where(Dedup.hamming64(col("siga"), col("sigb")) =!= col("dist")
          || col("dist") > 3)
        .select(lit("simhash_sound").as("violation"))
      twinViol.unionByName(soundViol)
    }),
    // HW1 cross-validation: sure ≤ exact-outlier count ≤ sure+uncertain
    // at the SAME (D, M)
    "check_outlier_bracket" -> ((s, d) => {
      val dD = 0.5; val m = 10
      // both paths over the SAME (deduplicated) point set — the
      // bracket theorem assumes one multiset
      val ptsU = Tables.pointsWithId(s, d)
      val exact = Outliers.neighborCounts(ptsU, dD)
        .where(col("cnt") <= m).count()
      val row = Outliers.approxOutlierCounts(ptsU.select("x", "y"), dD, m).head()
      val (sure, unc) = (row.getLong(0), row.getLong(1))
      val viol = if (sure <= exact && exact <= sure + unc) Seq.empty[String]
        else Seq(s"bracket sure=$sure exact=$exact unc=$unc")
      import s.implicits._
      viol.toDF("violation")
    }),
  )

  override def oracles: Map[String, String] =
    queries.keys.map(_ -> emptyOracle).toMap
}
