package graft

import graft.ops.{AsOf, Dedup, Freq, Outliers, Pack, RangeJoin, Similarity, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical scaling curves — the engine's twin of the reference's
  * HW2 scalability study (BASELINE.md Table 1): run each
  * scale-sensitive pipeline on generated fixtures at 1×, 3× and 10×
  * and fit the LOG-LOG SLOPE of time vs data size (least squares over
  * the three points). Every per-op law elsewhere verifies the design
  * at one scale; this is the one test that catches a hidden N² (a
  * fixed bucket count, an accidental cross join, a driver fold)
  * before a cluster does — and the three-point exponent fit (round
  * 10, replacing the coarse 20×/50× ratio bounds) distinguishes
  * "linear with big constants" from "N^1.3 creeping up" while damping
  * single-point scheduler noise.
  *
  * Fixture design — "weak scaling", so the TRUE answer grows ~linearly
  * and a superlinear slope indicts the implementation, not the problem:
  *  - points: uniform over an area ∝ N (constant density ⇒ constant
  *    neighbors/point, pair count ∝ N);
  *  - documents: 40 seeded-hash tokens from a vocabulary ∝ N (shingle
  *    space grows ⇒ random cross-doc collisions stay negligible) with
  *    a constant 2% planted near-dup rate (pair count ∝ N);
  *  - embeddings: isotropic seeded-hash vectors; bucket counts derive
  *    from N (nBitsFor/nlistFor), holding per-bucket occupancy flat;
  *  - as-of/range event tables: key count and value span ∝ N, so
  *    per-key rows and per-bucket density stay flat.
  *
  * Slope bounds: ideal weak-scaling slope is 1.0; measured effective
  * slopes on this box are 0.2–1.1 (fixed per-stage overhead at 1×
  * pushes the fit BELOW 1). Bound **1.5** for the linear-designed
  * pipelines; **1.8** for `ann_ivf`, which is N^1.5 BY DESIGN
  * (nlist ≈ √(nprobe·N) balances assignment against probe cost). A
  * quadratic measures slope ≈ 2 on compute-dominated runs and fails
  * both. Times are floored at 0.5 s in the fit — a lucky sub-100 ms
  * small run can't manufacture a steep slope — which only LOWERS the
  * fitted exponent, so the floor is slack for byte-identical code on
  * a loaded box, never a trap; fixtures are sized so the 1× runs sit
  * near or above the floor.
  *
  * Protocol: each pipeline runs once at 1× as JIT/codegen warmup, then
  * min-of-2 timed runs per scale. Fixtures are written to parquet once
  * and read back, so generation cost is never timed and every pipeline
  * starts from a scan like production.
  */
class ScalingSpec extends SparkSpec {

  private val SEED = 42L

  // ---- generators (deterministic: seeded xxhash64, no RNG state) ----

  private def u(c: org.apache.spark.sql.Column) =
    pmod(c, lit(1000000L)).cast("double") / 1000000.0

  /** Uniform points, density 4/unit² over a √(N/4)-sided square. */
  private def genPoints(n: Long): DataFrame = {
    val side = math.sqrt(n / 4.0)
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

  /** As-of left side: n events over n/50 keys (per-key rows constant),
    * times uniform in [0, 10·n) (event density per key constant). */
  private def genAsofLeft(n: Long): DataFrame = {
    val keys = math.max(100L, n / 50)
    spark.range(n).select(
      pmod(xxhash64(col("id"), lit(SEED + 7)), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(SEED + 8)), lit(10L * n)).as("t"),
      col("id").as("lv"))
  }

  /** As-of right side: n/5 reference rows over the same key/time
    * space, `rid` unique (the tie-break contract). */
  private def genAsofRight(n: Long): DataFrame = {
    val keys = math.max(100L, n / 50)
    spark.range(math.max(1L, n / 5)).select(
      pmod(xxhash64(col("id"), lit(SEED + 9)), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(SEED + 10)), lit(10L * n)).as("t"),
      col("id").as("rid"),
      xxhash64(col("id"), lit(SEED + 11)).as("rv"))
  }

  /** Range-join points: value span ∝ N at constant density 100/unit. */
  private def genRangePoints(n: Long): DataFrame = {
    val span = n / 100.0
    spark.range(n).select(col("id").as("pid"),
      (u(xxhash64(col("id"), lit(SEED + 3))) * span).as("v"))
  }

  /** Range-join intervals: n/10 intervals of length 0.5–2.5 over the
    * same span — expected matches/interval ≈ 100·len, constant. */
  private def genRangeIntervals(n: Long): DataFrame = {
    val span = n / 100.0
    val lo = u(xxhash64(col("id"), lit(SEED + 4))) * span
    spark.range(math.max(1L, n / 10)).select(col("id").as("iid"),
      lo.as("lo"), (lo + 0.5 + u(xxhash64(col("id"), lit(SEED + 5))) * 2.0).as("hi"))
  }

  /** Docs with a PLANTED CHAIN: ids < chainLen slide a 40-token window
    * one token per step over a collision-free "c"-token stream (doc i
    * vs doc i+d shares 40−d tokens ⇒ exact 3-gram jaccard
    * (38−d)/(38+d): ≈0.95 consecutive, above the 0.3 LSH verify bar up
    * to d≈20), so the LSH pair graph over the chain is a deep path
    * with short skips — the adversarial shape for label propagation,
    * whose plain form needs ∝ diameter rounds. Ids ≥ chainLen are
    * random 40-token docs (vocab ∝ N, no planted pairs) — singleton
    * background that converges in one round. */
  private def genChainDocs(n: Long, chainLen: Long): DataFrame = {
    val vocab = math.max(1000L, n / 5)
    val chainToks = transform(sequence(lit(0), lit(39)), j =>
      concat(lit("c"), (col("id") + j).cast("string")))
    val randToks = transform(sequence(lit(0), lit(39)), j =>
      concat(lit("w"), pmod(xxhash64(col("id"), j, lit(SEED)), lit(vocab))))
    spark.range(n).select(col("id").as("doc_id"),
      array_join(when(col("id") < chainLen, chainToks).otherwise(randToks), " ")
        .as("text"))
  }

  // ---- harness ----

  // fixtures run to ~GB at the 10× scales — delete on JVM exit, or
  // /tmp accrues one copy per suite run on a long-lived box
  private lazy val dir = {
    val p = java.nio.file.Files.createTempDirectory("graft_scaling")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      catch { case _: Throwable => () }
    }
    p.toString
  }

  private def materialize(name: String, df: DataFrame): String = {
    val path = s"$dir/$name"
    df.write.mode("overwrite").parquet(path)
    path
  }

  private def rd(p: String) = spark.read.parquet(p)

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

  /** Least-squares slope of ln(max(t, 0.5)) against ln(scale). */
  private def fitSlope(scales: Seq[Double], ts: Seq[Double]): Double = {
    val xs = scales.map(math.log)
    val ys = ts.map(t => math.log(math.max(t, 0.5)))
    val xm = xs.sum / xs.size
    val ym = ys.sum / ys.size
    xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
      xs.map(x => (x - xm) * (x - xm)).sum
  }

  test("1x->3x->10x: log-log slope stays sub-quadratic for every scale-sensitive pipeline") {
    val scales = Seq(1.0, 3.0, 10.0)
    def fixture(kind: String, gen: Long => DataFrame, base: Long): Seq[String] =
      scales.zipWithIndex.map { case (f, i) =>
        materialize(s"$kind$i", gen((base * f).toLong)) }

    val pts = fixture("pts", genPoints, 150000)
    val docs = fixture("docs", genDocs, 15000)
    val embs = fixture("emb", genEmbeddings, 20000)
    // as-of/range bases sized so the 10× run clears the 0.5 s fit
    // floor by a wide margin (a 200k base measured flat ~0.2 s at
    // every scale — a fit over floored points asserts nothing)
    val asofL = fixture("asofl", genAsofLeft, 1000000)
    val asofR = fixture("asofr", genAsofRight, 1000000)
    val rpts = fixture("rpts", genRangePoints, 600000)
    val rints = fixture("rint", genRangeIntervals, 600000)

    case class Pipe(name: String, bound: Double, run: Int => Unit)
    val pipes = Seq(
      Pipe("outlier_exact", 1.5, i =>
        Outliers.exactOutliers(rd(pts(i)), d = 1.0, m = 10, k = 10).count()),
      Pipe("dedup_minhash", 1.5, i =>
        Dedup.minhashLshPairs(rd(docs(i)), 3, 32, 8, 0.3, SEED).count()),
      Pipe("dedup_ngram", 1.5, i =>
        Dedup.ngramJaccardPairs(rd(docs(i)), 3, 0.3).count()),
      Pipe("dedup_span_ratio", 1.5, i =>
        Dedup.dupNgramRatio(rd(docs(i)), 3).count()),
      Pipe("dedup_clusters", 1.5, { i =>
        val d = rd(docs(i))
        val pairs = Dedup.minhashLshPairs(d, 3, 32, 8, 0.3, SEED)
        Dedup.dupClusters(d.select("doc_id"), pairs).count()
      }),
      // the UDAF-merge path: 64-vote SimhashAgg over the exploded
      // token stream — one shuffle on doc id, map-side partial merge
      Pipe("dedup_simhash", 1.5, i =>
        Dedup.simhashSignatures(rd(docs(i)), SEED).count()),
      // same shape as the text_tfidf product query: (doc, term) tf agg,
      // term df agg, equi-join, per-doc top-5 window; vocab ∝ N keeps
      // df group sizes flat
      Pipe("text_tfidf", 1.5, { i =>
        val dd = rd(docs(i))
        val n = dd.count()
        val tf = dd.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("sc").desc, col("term"))
        tf.join(dfq, "term")
          .withColumn("sc", col("tf") *
            round(log((lit(n) + 1.0) / (col("df") + 1.0)) * 1e6).cast("long"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5).count()
      }),
      // shards ∝ N — the op's documented 100 TB knob (per-shard doc
      // lists stay task-sized, the window cumsum per shard stays flat);
      // the filter must consume a window output or ColumnPruning drops
      // the cumsum from the timed plan (the asof_join lesson)
      Pipe("pack_chunks", 1.5, { i =>
        val dd = rd(docs(i))
        Pack.chunkPack(dd, Text.tokenCount(col("text")),
            ctx = 128, nShards = math.max(16L, dd.count() / 1000).toInt)
          .where(col("first_chunk") >= 0).count()
      }),
      // Θ(chars): char-gram count groupBy + gram equi-join + per-doc
      // agg; the counts table is bounded by charset³ at ANY corpus
      // size, so the join side stays flat while the gram stream grows
      // linearly. The rare_ratio filter keeps the n_rare aggregate
      // (and with it the count join) in the timed plan.
      Pipe("text_rarity", 1.5, i =>
        Text.corpusRarity(rd(docs(i)))
          .where(col("rare_ratio") >= 0).count()),
      // segment shuffle + threshold join + doc-key reassembly —
      // Θ(segments); vocab ∝ N keeps cross-doc segment collisions (and
      // so the flagged side) negligible, which IS the claim: cost must
      // track the segment stream, not the corpus². count(clean_md5)
      // forces the md5-of-reassembly so pruning can't drop the
      // collect_list/array_sort (the asof_join lesson)
      Pipe("text_boilerplate", 1.5, i =>
        Text.boilerplateScrub(rd(docs(i)),
            Text.tokenSegments(col("text"), 3), minDocs = 3)
          .agg(sum(col("n_boiler")), count(col("clean_md5"))).collect()),
      // spill-clustered exact-cosine dedup: nClusters ∝ N keeps
      // per-cell occupancy flat, so PAIR work ≈ N · occupancy ·
      // nAssign² — and above RoutedClustersThreshold the operator
      // auto-trains/assigns through the two-level CentroidTree, so
      // the ASSIGNMENT is N·(√k + nRoute·√k) dots too (flat N·k
      // assignment is quadratic under k ∝ N — the round-12 fix to
      // this pipe's creeping slope)
      Pipe("dedup_semantic", 1.5, { i =>
        val e = rd(embs(i))
        val n = e.count()
        Similarity.semanticNearDupPairs(e, 0.9,
          nClusters = math.max(4L, n / 128L).toInt, vecCol = "embedding").count()
      }),
      // the nightly-ingest face of semantic dedup: assign a 1/5 batch
      // under a fixed quantizer and score ONLY batch × index within
      // shared cells (semanticNewPairs) — cost ∝ |batch| · occupancy
      // · nAssign², which under weak scaling is linear like the batch;
      // a regression to re-clustering the corpus would show the
      // one-shot pipeline's steeper curve plus its constant. Routed
      // through the same CentroidTree as the one-shot face.
      Pipe("dedup_semantic_incr", 1.5, { i =>
        val e = rd(embs(i))
        val n = e.count()
        val tree = Similarity.hierarchicalCentroids(e,
          math.max(4L, n / 128L).toInt)
        val isNew = pmod(col("vec_id"), lit(5)) === 0
        val idx = Similarity.semanticAssignRouted(e, tree, nAssign = 2)
        Similarity.semanticNewPairs(
          Similarity.semanticAssignRouted(e.where(isNew), tree, nAssign = 2),
          idx, 0.9).count()
      }),
      // the two-level prefix sum scans and windows EVERY row before
      // the budget filter (the filter needs cum, so pruning cannot
      // drop the window) — Θ(N) independent of the budget; 5 groups
      // would be 5 reducers under the naive single window, but the
      // bucket level keeps 16·5-way parallelism at every scale
      Pipe("mixture_budget", 1.5, i =>
        Freq.tokenBudgetSample(
          rd(docs(i)).withColumn("source",
            concat(lit("s"), pmod(col("doc_id"), lit(5)))),
          Text.tokenCount(col("text")), budget = 10000L,
          groupCol = "source", idCol = "doc_id").count()),
      // the GLOBAL two-level prefix sum (no group key at all — one
      // logical order over the corpus): 16 md5-prefix buckets hold
      // N/16 rows each, so in-bucket window sorts grow linearly and
      // the single-partition offset window stays 16 rows at every
      // scale; filtering on `off` (window-derived) keeps the cumsum
      // in the timed plan (the asof_join lesson)
      Pipe("shard_plan", 1.5, i =>
        Pack.shardPlan(rd(docs(i)), Text.tokenCount(col("text")),
            nShards = 16, seed = SEED)
          .where(col("off") >= 0).count()),
      // FFD per seeded shard: greedy packing is sequential PER SHARD
      // by nature, so the documented 100 TB knob is nShards ∝ N —
      // per-shard doc lists stay task-sized and shards pack in
      // parallel; the mapPartitions state is one remaining-capacity
      // array, so time must track the doc stream
      Pipe("pack_bins", 1.5, { i =>
        val dd = rd(docs(i))
        Pack.binPack(dd, Text.tokenCount(col("text")),
            ctx = 128, nShards = math.max(16L, dd.count() / 1000).toInt)
          .where(col("off") >= 0).count()
      }),
      // UniMax water-filling: the level computation windows ONLY the
      // #groups metadata table (5 rows here at every scale); the
      // per-row work is the same two-level prefix sum as
      // mixture_budget plus a broadcast budgets join — Θ(N) total,
      // with the fixed group count never becoming a 5-reducer stage
      Pipe("mixture_fairshare", 1.5, i =>
        Freq.fairShareSample(
          rd(docs(i)).withColumn("source",
            concat(lit("s"), pmod(col("doc_id"), lit(5)))),
          Text.tokenCount(col("text")), budget = 10000L,
          groupCol = "source", idCol = "doc_id").count()),
      // the end-to-end curation chain (same stage composition as the
      // curation_funnel product query: junk cut → exact dedup →
      // boilerplate scrub → token-budget mixture) — each stage is
      // individually slope-gated above/elsewhere; this pins that the
      // COMPOSITION (with its cached intermediates and stage-to-stage
      // joins) stays linear too, not just the parts
      Pipe("curation_funnel", 1.5, { i =>
        import org.apache.spark.sql.expressions.Window
        val dd = rd(docs(i)).withColumn("source",
          concat(lit("s"), pmod(col("doc_id"), lit(5))))
        val quality = dd.join(
          Text.junkFilter(dd).where(col("keep")).select("doc_id"), Seq("doc_id"))
        val dedup = quality
          .withColumn("_rk", row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .where(col("_rk") === 1).drop("_rk")
        val seg = dedup.select(col("doc_id"), col("source"),
          posexplode(Text.tokenSegments(col("text"), 3)).as(Seq("idx", "seg")))
          .cache()
        val boiler = seg.groupBy("seg")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .where(col("nd") >= 3).select(col("seg"), lit(true).as("_b"))
        val clean = seg.join(boiler, Seq("seg"), "left").where(col("_b").isNull)
          .groupBy("doc_id", "source")
          .agg(sum(size(split(col("seg"), " ")).cast("long")).as("ct"))
        Freq.tokenBudgetSample(clean, col("ct"), budget = 10000L,
          groupCol = "source", idCol = "doc_id").count()
      }),
      // the export composition (the export_plan product query's
      // shape: curation chain → fair-share budgets → per-source
      // selection → token-balanced shard plan → chunk ids). Budget ∝
      // corpus so the SELECTED set scales too — a fixed budget would
      // make the post-selection stages constant-size and the fit
      // vacuous. Each stage is individually slope-gated; this pins
      // the composition.
      Pipe("export_plan", 1.5, { i =>
        import org.apache.spark.sql.expressions.Window
        val dd = rd(docs(i)).withColumn("source",
          concat(lit("s"), pmod(col("doc_id"), lit(5))))
        val quality = dd.join(
          Text.junkFilter(dd).where(col("keep")).select("doc_id"), Seq("doc_id"))
        val dedup = quality
          .withColumn("_rk", row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .where(col("_rk") === 1).drop("_rk")
        val seg = dedup.select(col("doc_id"), col("source"),
          posexplode(Text.tokenSegments(col("text"), 3)).as(Seq("idx", "seg")))
          .cache()
        val boiler = seg.groupBy("seg")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .where(col("nd") >= 3).select(col("seg"), lit(true).as("_b"))
        val clean = seg.join(boiler, Seq("seg"), "left").where(col("_b").isNull)
          .groupBy("doc_id", "source")
          .agg(sum(size(split(col("seg"), " ")).cast("long")).as("ct"))
        val sel = Freq.fairShareSample(clean, col("ct"),
            budget = dd.count() * 4, groupCol = "source", idCol = "doc_id")
          .select(col("group").as("source"), col("id").as("doc_id"),
            col("w").as("n_tok"))
          .cache()
        Pack.shardPlan(sel, col("n_tok"), nShards = 16, seed = SEED)
          .where(col("off") >= 0).count()
      }),
      // matched-row count depends on the window-carried right struct —
      // a bare count() would let ColumnPruning drop the window exec
      // entirely and time only the union scan (measured: flat 0.2 s
      // from 1M to 10M rows)
      Pipe("asof_join", 1.5, i =>
        AsOf.asOfJoin(rd(asofL(i)), rd(asofR(i)))
          .where(col("rid").isNotNull).count()),
      Pipe("range_join", 1.5, i =>
        RangeJoin.pointInInterval(rd(rpts(i)), rd(rints(i)), bucketWidth = 1.0)
          .count()),
      Pipe("ann_bucketed", 1.5, { i =>
        val e = rd(embs(i))
        val n = e.count()
        Similarity.annBucketed(e, 1, dim = 16, nBits = Similarity.nBitsFor(n),
          seed = SEED).count()
      }),
      // N^1.5 by design: nlist ≈ √(nprobe·N) — ideal slope 1.5
      Pipe("ann_ivf", 1.8, { i =>
        val e = rd(embs(i))
        val n = e.count()
        Similarity.annIvf(e, 1, nlist = Similarity.nlistFor(n), nprobe = 4).count()
      }),
      // filtered IVF at sel = 1/3: the eligible pre-filter and the
      // ~1/sel probe widening are selectivity-dependent CONSTANTS,
      // not exponents (the widened search scans ~the same candidate
      // volume ann_ivf does) — so the slope budget is ann_ivf's 1.8
      Pipe("ann_ivf_filtered", 1.8, { i =>
        val e = rd(embs(i))
        val n = e.count()
        Similarity.annIvfFiltered(e, 1, nlist = Similarity.nlistFor(n),
          nprobe = 4, corpusPred = pmod(col("vec_id"), lit(3)) === 0).count()
      }),
      // IVFADC: same N^1.5 routing as ann_ivf (nlist ∝ √N) but the
      // candidate stream is m-byte codes through the ADC loop and
      // floats are read only for the nq·rerank shortlist — the
      // constant drops, the exponent budget is the same 1.8
      Pipe("ann_ivfadc", 1.8, { i =>
        val e = rd(embs(i))
        val n = e.count()
        Similarity.annIvfPq(e, 1, nlist = Similarity.nlistFor(n), nprobe = 4,
          m = 8, ksub = 16, rerank = 32).count()
      }))

    // the planted dups must actually exercise the pair paths
    assert(Dedup.minhashLshPairs(rd(docs(0)), 3, 32, 8, 0.3, SEED).count() > 0,
      "scaling fixture planted no near-dup pairs")
    assert(RangeJoin.pointInInterval(rd(rpts(0)), rd(rints(0)), 1.0).count() > 0,
      "range fixture produced no matches")
    spark.sharedState.cacheManager.clearCache()

    val results = pipes.map { p =>
      p.run(0) // warmup: codegen + JIT for this pipeline's plan shape
      spark.sharedState.cacheManager.clearCache()
      val ts = scales.indices.map(i => timed(p.run(i)))
      (p, ts, fitSlope(scales, ts))
    }

    info(f"${"pipeline"}%-18s ${"t(1x)"}%8s ${"t(3x)"}%8s ${"t(10x)"}%8s ${"slope"}%7s ${"bound"}%6s")
    results.foreach { case (p, ts, sl) =>
      info(f"${p.name}%-18s ${ts(0)}%8.2f ${ts(1)}%8.2f ${ts(2)}%8.2f $sl%7.2f ${p.bound}%6.1f")
    }
    results.foreach { case (p, ts, sl) =>
      assert(sl <= p.bound,
        f"${p.name}: fitted growth exponent $sl%.2f over scales 1/3/10 " +
          f"(times ${ts.map(t => f"$t%.2f").mkString("/")} s; bound ${p.bound}%.1f) — " +
          "superlinear growth beyond the design budget, check for a hidden N^2")
    }
  }

  test("dupClusters long chain: shortcut rounds grow ~log(diameter), not ~diameter") {
    // chain = 1% of N. LSH links reach ~8-10 steps reliably, so the
    // pair-graph diameter is ≈ chainLen/9: ~11 at 1×, ~110 at 10×.
    // Plain propagation would need ∝ diameter rounds (≫ maxIters at
    // 10×); shortcutting doubles pointer reach per round, so rounds
    // stay ~log₂(diameter) + setup/probe constants.
    def rounds(n: Long, chainLen: Long): Int = {
      val p = materialize(s"chain$n", genChainDocs(n, chainLen))
      val d = rd(p)
      val pairs = Dedup.minhashLshPairs(d, 3, 32, 8, 0.3, SEED)
      assert(pairs.where(col("a") < lit(chainLen)).count() >= chainLen - 1,
        "chain fixture planted too few chain pairs")
      val (labels, iters) = Dedup.dupClustersWithRounds(
        d.select("doc_id"), pairs, maxIters = 40, shortcut = true)
      labels.count()
      spark.sharedState.cacheManager.clearCache()
      iters
    }
    val r1 = rounds(10000, 100)
    val r10 = rounds(100000, 1000)
    info(s"dupClusters shortcut rounds: chain 100 -> $r1, chain 1000 -> $r10")
    assert(r1 >= 2, s"chain fixture converged in $r1 round(s) — it must " +
      "exercise the iterative path")
    // diameter grew 10×; log growth allows only a small additive bump
    assert(r10 <= r1 + 6,
      s"rounds grew $r1 -> $r10 on a 10× deeper chain — ~linear in " +
        "diameter, shortcutting is not doubling reach")
    assert(r10 <= 16,
      s"$r10 rounds for a ~110-diameter chain — far above the ~log₂ " +
        "budget, shortcutting is not effective")
  }

  test("10x scale: IVFADC ε-recall@1 floor holds — fast AND still correct at scale") {
    // the slope test proves ann_ivfadc stays CHEAP at 10×; this is the
    // other half of the claim — that it stays CORRECT: at the 10×
    // fixture (200k vectors, nlist/nprobe/sample all derived from N by
    // the production sizing rules, quantizers trained by the operator
    // itself) the ε-recall@1 of the full IVFADC+rerank face against
    // the exact NN must clear the same 0.80 floor check_ivfpq pins at
    // the sf fixtures — closing the "fast but silently degrading"
    // blind spot. The exact side is slice × corpus (1k × 200k codegen
    // dots), not corpus².
    val n = 200000L
    val p = materialize("embrecall", genEmbeddings(n))
    val e = rd(p)
    val slice = pmod(col("vec_id"), lit(200)) === 0
    val ex = Similarity.cosineTopK(e, 1, queryPred = slice)
      .select(col("vec_id"), col("nn_id").as("nn_e"))
    val ipq = Similarity.annIvfPq(e, 1, nlist = Similarity.nlistFor(n),
        nprobe = 4, m = 8, ksub = 16, rerank = 32, queryPred = slice)
      .select(col("vec_id"), col("nn_id").as("nn_i"))
    val ev = e.select(col("vec_id").as("eid"), col("embedding").as("v"))
    val (h, nq) = graft.queries.CheckQueries.recallAt1(ev, ex, ipq, "nn_i",
      eps = 0.15)
    info(f"ivfadc 10x recall@1(eps=0.15): $h/$nq = ${h.toDouble / nq}%.3f")
    assert(nq >= 500, s"recall probe audited only $nq queries")
    assert(h.toDouble >= 0.80 * nq,
      f"IVFADC ε-recall@1 at the 10× fixture is ${h.toDouble / nq}%.3f " +
        "— below the 0.80 floor check_ivfpq holds at sf scale; the index " +
        "is fast but silently degrading as the corpus grows")
  }

  test("10x scale: filtered-IVF ε-recall@1 floor holds under selectivity widening") {
    // the filtered face's novel machinery is the selectivity-widened
    // probe count; this floors its recall at the scale where nlist
    // (∝ √N) and the widening actually interact — vs the EXACT
    // filtered NN (cosineTopK corpusPred, slice × eligible-corpus,
    // not corpus²) at the same 0.85/ε=0.15 bar check_ann_filtered
    // holds at sf scale. Containment is re-asserted at scale too: an
    // ineligible leak at 10× would be invisible to the sf checks.
    val n = 200000L
    val p = materialize("embrecall", genEmbeddings(n))
    val e = rd(p)
    val slice = pmod(col("vec_id"), lit(200)) === 0
    val pred = pmod(col("vec_id"), lit(3)) === 0
    val ex = Similarity.cosineTopK(e, 1, queryPred = slice, corpusPred = pred)
      .select(col("vec_id"), col("nn_id").as("nn_e"))
    val flt = Similarity.annIvfFiltered(e, 1, nlist = Similarity.nlistFor(n),
        nprobe = 4, corpusPred = pred, queryPred = slice)
      .select(col("vec_id"), col("nn_id").as("nn_f")).localCheckpoint()
    assert(flt.join(e.where(pred).select(col("vec_id").as("nn_f")),
        Seq("nn_f"), "left_anti").count() === 0,
      "an ineligible neighbor leaked at the 10× fixture")
    val ev = e.select(col("vec_id").as("eid"), col("embedding").as("v"))
    val (h, nq) = graft.queries.CheckQueries.recallAt1(ev, ex, flt, "nn_f",
      eps = 0.15)
    info(f"filtered-IVF 10x recall@1(eps=0.15): $h/$nq = ${h.toDouble / nq}%.3f")
    assert(nq >= 500, s"recall probe audited only $nq queries")
    assert(h.toDouble >= 0.85 * nq,
      f"filtered-IVF ε-recall@1 at the 10× fixture is ${h.toDouble / nq}%.3f " +
        "— below the 0.85 floor check_ann_filtered holds at sf scale; " +
        "the selectivity widening is not compensating as designed")
    // the ADC twin compounds THREE approximations — selectivity
    // widening × coarse routing × PQ distance (exact rerank on top) —
    // and its recall is floored only at sf scale (check_ann_filtered's
    // 0.80 ADC leg); this is the compounded floor at the scale where
    // nlist, the widening, and the m-byte codes actually interact
    val fltAdc = Similarity.annIvfPqFiltered(e, 1,
        nlist = Similarity.nlistFor(n), nprobe = 4, corpusPred = pred,
        m = 8, ksub = 16, rerank = 32, queryPred = slice)
      .select(col("vec_id"), col("nn_id").as("nn_a")).localCheckpoint()
    assert(fltAdc.join(e.where(pred).select(col("vec_id").as("nn_a")),
        Seq("nn_a"), "left_anti").count() === 0,
      "an ineligible neighbor leaked from the filtered ADC face at 10×")
    val (ha, nqa) = graft.queries.CheckQueries.recallAt1(ev, ex, fltAdc,
      "nn_a", eps = 0.15)
    info(f"filtered-ADC 10x recall@1(eps=0.15): $ha/$nqa = ${ha.toDouble / nqa}%.3f")
    assert(ha.toDouble >= 0.80 * nqa,
      f"filtered-ADC compounded ε-recall@1 at the 10× fixture is " +
        f"${ha.toDouble / nqa}%.3f — below the 0.80 floor the sf-scale " +
        "check holds; the rerank is not recovering the PQ approximation " +
        "under the widened probing")
  }

  test("10x scale: routed semantic dedup recall floor holds where auto-routing actually engages") {
    // the sf fixtures never route (nClusters = N/256 < 64 there), so
    // the driver's check_semantic_dedup floor certifies only the FLAT
    // face — this probe runs the PRODUCT configuration at the 10×
    // fixture, where k = N/128 = 1562 cells puts the operator on the
    // routed path (spilled tree + adaptive margin), and floors its
    // pair recall against the flat assignment over the same cells at
    // the SemDeDup threshold. A routing regression (dead cells,
    // margin mis-sizing, spill loss) shows up here first, at the
    // scale it would actually ship.
    val n = 200000L
    val p = materialize("embrecall", genEmbeddings(n))
    val e = rd(p)
    val k = math.max(4L, n / 128L).toInt
    assert(k > Similarity.RoutedClustersThreshold,
      s"fixture no longer reaches the routed regime (k=$k)")
    val t = 0.9
    val routed = Similarity.semanticNearDupPairs(e, t, nClusters = k,
      nAssign = 3).select("a", "b").localCheckpoint()
    // flat reference over the SAME spilled tree's clusters — the
    // answer the routed path approximates (deterministic: same seed,
    // same training sample, same spill)
    val tree = Similarity.hierarchicalCentroids(e, k, spill = Similarity.spillFor(t))
    val flat = Similarity.semanticPairsFromIndex(
      Similarity.semanticAssign(e, tree.concat, nAssign = 3), t)
      .select("a", "b").localCheckpoint()
    val nFlat = flat.count()
    assert(nFlat >= 1000, s"10x fixture too sparse at cos>=0.9: $nFlat pairs")
    val hit = routed.join(flat, Seq("a", "b"), "left_semi").count()
    info(f"routed semantic 10x recall vs flat: $hit/$nFlat = ${hit.toDouble / nFlat}%.3f")
    assert(hit.toDouble >= 0.85 * nFlat,
      f"routed semantic recall ${hit.toDouble / nFlat}%.3f at the 10× " +
        "fixture — below the 0.85 floor the product face owes at the " +
        "scale where auto-routing engages")
  }

  test("10x scale: COMPOUNDED routed recall vs brute force on a sampled query slice") {
    // the probe above floors routed-vs-FLAT; the flat-vs-brute leg is
    // floored only at sf scale (check_semantic_dedup), where routing
    // is off — so the PRODUCT of the two losses was never measured at
    // routed scale. Whole-corpus brute at 200k is infeasible in spec
    // time (2·10^10 pairs); a sampled-query slice is not: exact-verify
    // a 1/40 slice of the vectors against the ENTIRE corpus (5k × 200k
    // codegen dots — the same shape as the IVFADC probe's exact side)
    // and floor the full pipeline's recall against that ground truth.
    // Pairs touching the slice are an unbiased sample of all pairs, so
    // slice recall estimates corpus recall.
    val n = 200000L
    val p = materialize("embrecall", genEmbeddings(n))
    val e = rd(p)
    val k = math.max(4L, n / 128L).toInt
    assert(k > Similarity.RoutedClustersThreshold,
      s"fixture no longer reaches the routed regime (k=$k)")
    val t = 0.9
    val routed = Similarity.semanticNearDupPairs(e, t, nClusters = k,
      nAssign = 3).select("a", "b").localCheckpoint()
    val vd = transform(col("embedding"), x => x.cast("double"))
    val prepped = e.select(col("vec_id").as("id"), vd.as("v"))
      .withColumn("nrm", sqrt(graft.functions.Native.dotNative(spark,
        col("v"), col("v"))))
    val qs = prepped.where(pmod(col("id"), lit(40)) === 0)
      .select(col("id").as("qa"), col("v").as("va"), col("nrm").as("na"))
    val rs = prepped.select(col("id").as("qb"), col("v").as("vb"), col("nrm").as("nb"))
    val brute = qs.join(rs, col("qa") =!= col("qb"))
      .where(graft.functions.Native.dotNative(spark, col("va"), col("vb"))
        / (col("na") * col("nb")) >= t)
      .select(least(col("qa"), col("qb")).as("a"),
        greatest(col("qa"), col("qb")).as("b"))
      .distinct().localCheckpoint()
    val nBrute = brute.count()
    info(s"compounded probe ground truth: $nBrute brute pairs touch the slice")
    assert(nBrute >= 100, s"slice too sparse for a recall floor: $nBrute pairs")
    val hit = routed.join(brute, Seq("a", "b"), "left_semi").count()
    info(f"compounded routed-vs-brute 10x recall: $hit/$nBrute = ${hit.toDouble / nBrute}%.3f")
    // measured 0.822 (924/1124 — ≈ the 0.887 routed-vs-flat times a
    // ~0.93 flat-vs-brute leg); floor at 0.75 leaves slice-sampling
    // slack while a regression in EITHER leg (spill sizing, margin,
    // nAssign spill, dead cells) still lands here
    assert(hit.toDouble >= 0.75 * nBrute,
      f"compounded routed recall ${hit.toDouble / nBrute}%.3f vs brute " +
        "at the 10× fixture — below the 0.75 floor; one of the two " +
        "approximation legs regressed")
  }
}
