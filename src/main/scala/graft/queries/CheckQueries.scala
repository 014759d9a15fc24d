package graft.queries

import graft.ops.{Dedup, Fft, Freq, Outliers}
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
    // FFT law: radius is non-increasing in K
    "check_fft_monotone" -> ((s, d) => {
      val pts = Tables.points(s, d)
      val r8 = Fft.radius(pts, Fft.centers(pts, 8, 16))
      val r16 = Fft.radius(pts, Fft.centers(pts, 16, 16))
      val viol = if (r16 <= r8 + 1e-12) Seq.empty[String] else Seq("radius_monotone")
      import s.implicits._
      viol.toDF("violation")
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
