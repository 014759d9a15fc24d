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
}
