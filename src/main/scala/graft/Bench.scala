package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given SF.
  *
  * Protocol: every query runs THREE times and the minimum is
  * reported — first runs are dominated by Janino codegen + JIT
  * compilation (measured ~10s on 32-aggregate plans vs ~1s
  * steady-state), the baseline reports run averages, not cold starts
  * (BASELINE.md: "all values are averages of 3 runs"), and scheduler
  * jitter on this box swings identical plans ±2-3× between rounds.
  * Uniform min-of-3 (r9, replacing the adaptive 2-or-3 of r7/r8,
  * which gave the SLOWEST, noisiest queries the FEWEST samples —
  * r8's `outlier_exact` 3.35→7.62 s "regression" on byte-identical
  * code) makes round-over-round deltas attributable: the protocol is
  * fixed, so a delta is code or environment, never sample count.
  *
  * Output: the FULL result (per-query seconds at ns precision,
  * errors) goes to `bench_out.json`; stdout gets ONE compact JSON
  * line as the LAST print. BOTH lines carry the same "value"
  * semantics — the total over ALL queries that ran, checks included —
  * plus the decomposition `main_sec` (product queries) and
  * `checks_sec` (the `check_*` invariant gates; min-of-3, so largely
  * scratch-cache-warm), `checks_cold_sec` (sum of each check's FIRST
  * run in this JVM — what a cold validation pass actually costs, kept
  * honest against per-JVM caching trims), and the protocol
  * tags `"agg":"min","runs":3`, so cross-round headline comparison is
  * self-describing. The driver captures only the final ~2000 chars of
  * stdout, so the line must fit that window whole: sbt's "[success]"
  * epilogue is suppressed (build.sbt `showSuccess`), per-query values
  * are rounded to 10 ms, and `check_*` queries appear only in the
  * `checks_sec` scalar. A stderr warning fires if the line outgrows
  * the 1985-char budget.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed global warmup: the first measured query otherwise absorbs
    // one-time costs shared by every plan — Spark-core JIT, codegen
    // framework classloading, parquet footer reads of the SF tables
    // (observed as a trivial groupBy-count reading 0.18 s in one driver
    // round and 2.72 s in the next with identical code). The flagship
    // entry exercises scan→shuffle→agg; the per-table counts touch
    // every footer at the benched SF.
    try {
      SparkEntry.entry(spark).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      spark.read.parquet(s"$sfDir/events.parquet").count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    } catch {
      // keep the run alive, but a failed warmup must be VISIBLE —
      // otherwise the first measured query silently re-absorbs the
      // JIT/footer costs the warmup exists to strip
      case e: Throwable =>
        System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // a failing query must be VISIBLE in the output — a swallowed
        // error would masquerade as a fast timing
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val times = Seq(once(), once(), once())
      spark.sharedState.cacheManager.clearCache()
      (name, times)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // a failing query fails FAST — summing its time would make a
    // breakage read as a speedup, so the headline total counts only
    // queries that ran (the errors list flags the rest)
    val total = results.collect { case (k, v) if !failed(k) => v.min }.sum
    val mainTotal = results.collect {
      case (k, v) if !failed(k) && !k.startsWith("check_") => v.min }.sum
    val checksTotal = results.collect {
      case (k, v) if !failed(k) && k.startsWith("check_") => v.min }.sum
    // the honest COLD cost of a validation pass: several checks ride
    // the per-JVM scratch/quantizer caches, so their min-of-3 mostly
    // measures cache warmth — the FIRST run of each check in this JVM
    // is the one that actually built its inputs (in this alphabetical
    // order; later checks legitimately reuse earlier checks' scratch,
    // exactly like a real cold validation run would)
    val checksCold = results.collect {
      case (k, v) if !failed(k) && k.startsWith("check_") => v.head }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // "errors" lists queries whose execution threw (timings for those
    // are meaningless and excluded from the totals)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","main_sec":$mainTotal,""" +
      s""""checks_sec":$checksTotal,"checks_cold_sec":$checksCold,""" +
      s""""runs":3,"errors":$errs,"agg":"min","queries":$qs,"sf":"$sfDir"}"""
    // full-fidelity JSON to a file (survives any stdout framing)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case _: Throwable => () }
    // compact stdout line — see the scaladoc's 2000-char-window budget.
    // value/main_sec/checks_sec/agg/runs appear in EVERY compaction
    // stage with the same semantics as bench_out.json (value = full
    // total incl. checks); only the per-query map compacts. Values are
    // rounded (trailing zeros stripped) and the sf dir reported by
    // basename — purely to keep the line inside the window as queries
    // accumulate; bench_out.json always keeps full precision.
    def rd(v: Double, decimals: Int): String =
      BigDecimal(v).setScale(decimals, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
    val mainQ = results.filter { case (k, _) => !k.startsWith("check_") }
    val errsPart = if (failed.isEmpty) "" else s""""errors":$errs,"""
    val sfName = new java.io.File(sfDir).getName
    def stdoutLine(withUnit: Boolean, decimals: Int): String = {
      val qsCompact = mainQ.map { case (k, v) => "\"" + k + "\":" + rd(v.min, decimals) }
        .mkString("{", ",", "}")
      val unitPart = if (withUnit) """"unit":"sec",""" else ""
      s"""{"metric":"total","value":${rd(total, 2)},$unitPart""" +
        s""""main_sec":${rd(mainTotal, 2)},"checks_sec":${rd(checksTotal, 2)},""" +
        s""""checks_cold_sec":${rd(checksCold, 2)},""" +
        s""""agg":"min","runs":3,${errsPart}"queries":$qsCompact,"sf":"$sfName"}"""
    }
    // adaptive stages: drop the unit tag (values are always seconds) →
    // coarsen per-query values to 100 ms. Budget 1985: the line plus
    // its newline must fit the 2000-char window with NOTHING after it
    // (sbt epilogue suppressed, unprefixed stdout — build.sbt).
    val compact = Seq(
      stdoutLine(withUnit = true, decimals = 2),
      stdoutLine(withUnit = false, decimals = 2),
      stdoutLine(withUnit = false, decimals = 1))
      .find(_.length <= 1985)
      .getOrElse(stdoutLine(withUnit = false, decimals = 1))
    if (compact.length > 1985)
      System.err.println(s"[bench] stdout line ${compact.length} chars — " +
        "over the 1985 budget, the driver's 2000-char tail window may clip it")
    println(compact)
    spark.stop()
  }
}
