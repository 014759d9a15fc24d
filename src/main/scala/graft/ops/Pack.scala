package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay a document corpus out as
  * fixed-size token chunks ("concat-and-chunk" — every document's
  * tokens land at a deterministic offset in a shard-local token
  * stream, and training sequence `k` is token range
  * `[k·ctx, (k+1)·ctx)`). This is the layout step a training-data
  * export runs after filtering/dedup; the chunk ids drive which docs
  * get written into which training-example file.
  *
  * Scale shape: documents hash into `nShards` independent token
  * streams (shard = doc_id mod nShards), so the only per-shard
  * sequential structure — the running token offset — is a window
  * cumsum per shard, and shards pack in parallel. At 100 TB you raise
  * `nShards` until a shard's doc list fits a task (the window sort is
  * per-shard, never global); ordering inside a shard is pinned by
  * doc_id, so the layout is reproducible run to run, which training
  * resume/restart requires.
  */
object Pack {

  /** Per-document chunk placement. Output columns:
    * `doc_id, shard, tok, off, first_chunk, last_chunk` — `off` is
    * the document's starting offset in its shard's token stream
    * (exclusive running sum in doc_id order), and the doc's tokens
    * span chunks `first_chunk..last_chunk` of size `ctx` (a doc may
    * straddle a boundary — concat-and-chunk splits it, the standard
    * pretraining tradeoff vs padding waste). Zero-token documents are
    * dropped: they occupy no tokens, so they have no chunk.
    *
    * `tokCol` is the per-doc token count expression, e.g.
    * `Text.tokenCount(col("text"))`.
    */
  def chunkPack(docs: DataFrame, tokCol: Column, ctx: Int, nShards: Int): DataFrame = {
    require(ctx > 0, "ctx must be positive")
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        tokCol.cast("long").as("tok"))
      .where(col("tok") > 0)
      .withColumn("off", coalesce(sum(col("tok")).over(w), lit(0L)))
      // `div` = exact integer division (no double roundtrip: a shard's
      // running offset at corpus scale can pass 2^53)
      .withColumn("first_chunk", expr(s"off div $ctx"))
      .withColumn("last_chunk", expr(s"(off + tok - 1) div $ctx"))
  }

  /** First-fit-decreasing bin packing — the PADDING-MINIMIZING packing
    * face ([[chunkPack]] is the padding-free but document-SPLITTING
    * face; this one never splits a doc and instead fills fixed
    * `ctx`-token bins as tightly as greedy allows, the layout used
    * when cross-document attention contamination matters more than
    * the padding tail). Each doc must fit a bin: rows with
    * `tok ∉ [1, ctx]` are dropped — chunk long docs with [[chunkPack]]
    * first if they must survive.
    *
    * Scale shape: docs hash into `nShards` independent streams
    * (seeded xxhash64 — decorrelated from id order), each shard
    * FFD-packed sequentially inside its task via `mapPartitions` with
    * only the bins' remaining-capacity array as state. Greedy packing
    * is inherently sequential PER SHARD — the knob is `nShards ∝ N`
    * (same contract as [[chunkPack]]): per-shard doc lists stay
    * task-sized, shards pack in parallel. Deterministic: shard
    * assignment is seeded, in-shard order is (tok desc, id), so the
    * same corpus + seed gives a byte-identical layout.
    *
    * Quality contract (the `check_binpack` law): no bin overflows
    * `ctx`; within a shard AT MOST ONE bin is ≤ half full — the
    * classic first-fit invariant (a later bin's first doc would have
    * fit any earlier ≤-half bin, and fills only grow), which bounds
    * bins ≤ 2·⌈tokens/ctx⌉ + 1 per shard, i.e. fill ≥ ~50% worst
    * case (FFD is ≤ 11/9·OPT + 6/9 in theory; measured fill on the
    * fixtures is far tighter).
    *
    * Output: `doc_id, tok, shard, bin, off` — bin is shard-local,
    * `off` the doc's first-token offset inside its bin. */
  def binPack(docs: DataFrame, tokCol: Column, ctx: Int, nShards: Int,
              seed: Long = 42L, idCol: String = "doc_id"): DataFrame = {
    require(ctx > 0, "ctx must be positive")
    require(nShards > 0, "nShards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        tokCol.cast("int").as("tok"))
      .where(col("tok") > 0 && col("tok") <= ctx)
      .withColumn("shard",
        pmod(xxhash64(col("doc_id"), lit(seed)), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("tok").desc, col("doc_id"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        // rows arrive grouped by shard (hash collisions co-locate
        // whole shards, never split one), tok-descending within; FFD
        // state resets on shard change
        var curShard = -1
        var rem = scala.collection.mutable.ArrayBuffer.empty[Int]
        it.map { case (id, tok, shard) =>
          if (shard != curShard) {
            curShard = shard
            rem = scala.collection.mutable.ArrayBuffer.empty[Int]
          }
          var b = 0
          while (b < rem.length && rem(b) < tok) b += 1
          if (b == rem.length) rem += ctx
          val off = ctx - rem(b)
          rem(b) -= tok
          (id, tok, shard, b, off)
        }
      }.toDF("doc_id", "tok", "shard", "bin", "off")
  }

  /** Token-balanced shard plan — the export-layout step a training
    * run does AFTER filtering/dedup: place every document at a
    * deterministic position in a seeded global shuffle order, then
    * cut that order into `nShards` contiguous token ranges of
    * (near-)equal size. Each shard's token total is within one
    * document of `ceil(total/nShards)` — unlike [[chunkPack]]'s
    * `id mod nShards` placement (or any count-balanced split), which
    * skews shard BYTES whenever document lengths skew. The seeded
    * md5 order is the deterministic global shuffle training
    * reproducibility requires: same corpus + seed ⇒ byte-identical
    * shard layout, and the order is decorrelated from ingest order
    * (no source/time runs inside a shard).
    *
    * Scale shape: the global token prefix sum is two-level — an
    * in-bucket window cumsum partitioned by the first `orderChars`
    * hex chars of the order key (16^orderChars buckets, each a
    * distributed partition-local sort), plus a bucket-offset table of
    * 16^orderChars rows whose window is the only single-partition
    * step (256 rows at orderChars=2 — metadata, not data). Same
    * machinery as `Freq.tokenBudgetSample`'s per-group prefix sum,
    * global here. The corpus total joins in as a broadcast 1-row
    * aggregate; no driver collect.
    *
    * Output: `doc_id, tok, cum` (inclusive global prefix sum in
    * shuffle order), `shard` (0-based), `off` (the doc's first-token
    * offset within its shard's range). All-integer arithmetic
    * (`div`, no double roundtrip), so the `shard_plan` oracle is
    * exact. Zero-token docs are dropped, as in [[chunkPack]]. */
  def shardPlan(docs: DataFrame, tokCol: Column, nShards: Int, seed: Long,
                idCol: String = "doc_id", orderChars: Int = 1): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(orderChars >= 1 && orderChars <= 8, "orderChars in [1, 8]")
    val base = docs
      .select(col(idCol).as("doc_id"), tokCol.cast("long").as("tok"))
      .where(col("tok") > 0)
      .withColumn("_k", md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))))
      .withColumn("_b", substring(col("_k"), 1, orderChars))
    val inBucket = Window.partitionBy("_b").orderBy(col("_k"), col("doc_id"))
    val cumIn = base.withColumn("_cin", sum(col("tok")).over(inBucket))
    val offsets = base.groupBy("_b").agg(sum(col("tok")).as("_bt"))
      .withColumn("_off",
        coalesce(sum(col("_bt")).over(Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    val total = base.agg(sum(col("tok")).as("_t"))
    cumIn.join(offsets, Seq("_b"))
      .withColumn("cum", col("_off") + col("_cin"))
      .crossJoin(broadcast(total))
      .withColumn("_target", expr(s"(_t + ${nShards - 1}) div $nShards"))
      .withColumn("shard", least(lit((nShards - 1).toLong),
        expr("(cum - tok) div _target")))
      .withColumn("off", col("cum") - col("tok") - col("shard") * col("_target"))
      .select("doc_id", "tok", "cum", "shard", "off")
  }
}
