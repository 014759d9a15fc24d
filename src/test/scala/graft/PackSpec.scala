package graft

import graft.ops.{Pack, Text}
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  private def toyDocs = Seq(
    // shard 0 (mod 2): ids 0, 2, 4 with 3, 5, 4 tokens
    (0L, "aa bb cc"),
    (2L, "dd ee ff gg hh"),
    (4L, "ii jj kk ll"),
    // shard 1: ids 1 (0 tokens -> dropped), 3 (6 tokens)
    (1L, "..."),
    (3L, "mm nn oo pp qq rr")
  ).toDF("doc_id", "text")

  test("chunkPack: offsets are contiguous per shard, chunk range matches hand computation") {
    val out = Pack.chunkPack(toyDocs, Text.tokenCount(col("text")), ctx = 4, nShards = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("tok"), r.getAs[Long]("off"),
          r.getAs[Long]("first_chunk"), r.getAs[Long]("last_chunk")))).toMap
    assert(out.keySet == Set(0L, 2L, 3L, 4L)) // doc 1 had no tokens
    assert(out(0L) == ((0L, 3L, 0L, 0L, 0L)))  // tokens [0,3) -> chunk 0
    assert(out(2L) == ((0L, 5L, 3L, 0L, 1L)))  // [3,8) straddles 4
    assert(out(4L) == ((0L, 4L, 8L, 2L, 2L)))  // [8,12) -> chunk 2 exactly
    assert(out(3L) == ((1L, 6L, 0L, 0L, 1L)))  // shard 1 restarts at 0
  }

  test("chunkPack: stream invariants hold on the documents fixture") {
    val ctx = 32
    val packed = Pack.chunkPack(
      spark.read.parquet(s"$sf0001/documents.parquet"),
      Text.tokenCount(col("text")), ctx, nShards = 4).cache()
    assert(packed.count() > 0)
    // offsets tile each shard's token stream exactly: next off == off + tok
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val gaps = packed
      .withColumn("next_off", lead(col("off"), 1).over(w))
      .where(col("next_off").isNotNull && col("next_off") =!= col("off") + col("tok"))
    assert(gaps.count() == 0, "token stream has gaps or overlaps")
    // chunk ids consistent with off/tok
    val bad = packed.where(
      col("first_chunk") =!= expr(s"off div $ctx") ||
        col("last_chunk") =!= expr(s"(off + tok - 1) div $ctx") ||
        col("last_chunk") < col("first_chunk"))
    assert(bad.count() == 0)
    packed.unpersist()
  }

  test("chunkPack: rejects nonpositive ctx and nShards") {
    intercept[IllegalArgumentException] {
      Pack.chunkPack(toyDocs, Text.tokenCount(col("text")), 0, 2)
    }
    intercept[IllegalArgumentException] {
      Pack.chunkPack(toyDocs, Text.tokenCount(col("text")), 4, 0)
    }
  }

  test("shardPlan: two-level prefix sum == one global window; shards token-balanced") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = 8; val seed = 7L
    val plan = Pack.shardPlan(docs, Text.tokenCount(col("text")), n, seed).cache()
    // parity: the oracle formulation — ONE global window in seeded order
    val brute = docs
      .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("tok"))
      .where(col("tok") > 0)
      .withColumn("cum", sum("tok").over(Window
        .orderBy(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))), col("doc_id"))))
    val withTarget = brute.crossJoin(broadcast(
      brute.agg(expr(s"(sum(tok) + ${n - 1}) div $n").as("_target"))))
    val expect = withTarget
      .withColumn("shard", least(lit((n - 1).toLong), expr("(cum - tok) div _target")))
      .withColumn("off", col("cum") - col("tok") - col("shard") * col("_target"))
      .select("doc_id", "tok", "cum", "shard", "off")
    assert(plan.exceptAll(expect).isEmpty && expect.exceptAll(plan).isEmpty,
      "two-level plan differs from the single-window formulation")
    // balance: every shard present; totals within one max-doc of target
    val totals = plan.groupBy("shard").agg(sum("tok").as("t"))
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("t")).toMap
    assert(totals.keySet == (0L until n.toLong).toSet, s"missing shards: $totals")
    val maxDoc = plan.agg(max("tok")).head().getLong(0)
    val target = withTarget.select("_target").head().getLong(0)
    totals.foreach { case (sh, t) =>
      assert(t <= target + maxDoc - 1, s"shard $sh overweight: $t vs target $target")
    }
    // determinism + seed sensitivity
    val again = Pack.shardPlan(docs, Text.tokenCount(col("text")), n, seed)
    assert(plan.exceptAll(again).isEmpty && again.exceptAll(plan).isEmpty)
    val other = Pack.shardPlan(docs, Text.tokenCount(col("text")), n, seed + 1)
    assert(plan.join(other, Seq("doc_id", "cum"), "inner").count() < plan.count(),
      "different seed produced the identical global order")
    plan.unpersist()
  }

  test("binPack: hand-computed FFD layout; oversize dropped; first-fit invariant") {
    // one shard so the whole fixture packs sequentially: FFD on toks
    // [6,5,4,3,2] at ctx=10 -> bin0: 6+4, bin1: 5+3+2 (perfect fill)
    val docs = Seq((1L, 6), (2L, 5), (3L, 4), (4L, 3), (5L, 2), (6L, 11), (7L, 0))
      .toDF("doc_id", "n_tok")
    val got = Pack.binPack(docs, col("n_tok"), ctx = 10, nShards = 1)
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    // doc 6 (tok 11 > ctx) and doc 7 (tok 0) are dropped
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), got.toString)
    assert(got(1L) == ((0, 0)) && got(3L) == ((0, 6)), got.toString)   // bin0: 6,4
    assert(got(2L) == ((1, 0)) && got(4L) == ((1, 5)) && got(5L) == ((1, 8)))
    // multi-shard real corpus: capacity + exactly-once + determinism
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val p1 = Pack.binPack(corpus, Text.tokenCount(col("text")), 128, 8).cache()
    val fills = p1.groupBy("shard", "bin").agg(sum("tok").as("fill"))
    assert(fills.where(col("fill") > 128).isEmpty, "bin overflow")
    // at most one <=-half bin per shard (first-fit invariant)
    val slack = fills.where(col("fill") * 2 <= 128)
      .groupBy("shard").count().where(col("count") > 1)
    assert(slack.isEmpty, "multiple half-empty bins in one shard")
    val p2 = Pack.binPack(corpus, Text.tokenCount(col("text")), 128, 8)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
    p1.unpersist()
  }

  test("ngramContamination: hand-computed overlap, bench grams never self-report") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      // shares "the quick brown" and "quick brown fox" out of 3 distinct trigrams
      (1L, "the quick brown fox sleeps"),
      // no shared trigram
      (2L, "a totally different sentence here"),
      // too short: no trigram -> dropped
      (3L, "two words")
    ).toDF("doc_id", "text")
    val out = Text.ngramContamination(train, bench, 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("contam_ratio")))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, 2L, 0.666667)))
    assert(out(2L) == ((3L, 0L, 0.0)))
  }

  test("ngramContamination: duplicate grams in a doc count once (set semantics)") {
    val bench = Seq((9L, "x y z")).toDF("doc_id", "text")
    val train = Seq((1L, "x y z x y z x y z")).toDF("doc_id", "text")
    val r = Text.ngramContamination(train, bench, 3).head()
    // distinct trigrams of the repeated text: "x y z","y z x","z x y"
    assert(r.getAs[Long]("n_grams") == 3L)
    assert(r.getAs[Long]("n_hit") == 1L)
  }
}
