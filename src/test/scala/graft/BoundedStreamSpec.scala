package graft

import graft.streaming.Bounded
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BoundedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeChunks(dir: String, xs: Seq[(Long, Long)], chunks: Int): Unit = {
    val per = math.ceil(xs.length.toDouble / chunks).toInt
    xs.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("ord", "item").coalesce(1)
        .write.parquet(s"$dir/chunk_$i")
      Thread.sleep(5) // distinct mtimes -> stable file order
    }
  }

  test("streaming over file chunks == batch twin (exact parity, same seed)") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val rnd = new scala.util.Random(11)
    val xs = (0L until 2000L).map(i => (i, (rnd.nextInt(40) + 1).toLong))
    writeChunks(s"$tmp/in", xs, 5)
    // stream over all 5 chunk dirs via glob
    val stream = Bounded.fileStream(spark, s"$tmp/in/chunk_*")
    val n = 1500L; val m = 20; val p = 0.2; val seed = 42L
    val s1 = Bounded.run(stream, n, m, p, seed, s"$tmp/ckpt")
    val s2 = Bounded.batchTwin(xs.toDF("ord", "item"), n, m, p, seed)
    assert(s1.seen == n && s2.seen == n)
    assert(s1.histogram == s2.histogram)
    assert(s1.reservoir.toSeq == s2.reservoir.toSeq)
    assert(s1.sticky == s2.sticky)
  }

  test("sticky quality sweep: eps 0.06->0.03 tightens to exact 10/10 (BASELINE HW3 table shape)") {
    // the reference's sticky-sampling quality table (n=1M, phi=0.07,
    // delta=0.1, eps in {0.03..0.06}): estimated frequent items
    // shrink from 14 to EXACTLY the 10 true ones as eps tightens,
    // with all 10 true items present at every eps. Replicated on a
    // synthetic Zipf-shaped stream with planted frequency bands:
    // 10 true items at 7.5%, pairs at 3.95%/2.95%/1.95% (one band per
    // eps threshold phi-eps in {0.04,0.03,0.02,0.01}), Zipf tail.
    // Inclusion needs a margin above the threshold (sticky UNDERcounts
    // by ~eps*n/ln(1/(phi*delta)) before the first successful coin
    // flip); exclusion is guaranteed by cnt <= true freq alone.
    val tmp = Files.createTempDirectory("graft_quality").toString
    val n = 1000000
    val phi = 0.07; val delta = 0.1
    val items: Seq[Long] =
      (1L to 10L).flatMap(Seq.fill(75000)(_)) ++   // true frequent
      (11L to 12L).flatMap(Seq.fill(39500)(_)) ++  // band [0.03, 0.04)
      (13L to 14L).flatMap(Seq.fill(29500)(_)) ++  // band [0.02, 0.03)
      (15L to 16L).flatMap(Seq.fill(19500)(_)) ++  // band [0.01, 0.02)
      (100L until 173L).flatMap(Seq.fill(1000)(_)) // tail < 0.01
    assert(items.length == n)
    val stream = new scala.util.Random(97).shuffle(items)
      .zipWithIndex.map { case (x, i) => (i.toLong, x) }
    writeChunks(s"$tmp/in", stream, 10)

    val results = Seq(0.06, 0.05, 0.04, 0.03).map { eps =>
      val p = math.min(1.0, graft.ops.Freq.stickyRate(phi, eps, delta) / n)
      val st = Bounded.run(Bounded.fileStream(spark, s"$tmp/in/chunk_*"),
        n.toLong, m = 15, stickyP = p, seed = 42L, s"$tmp/ckpt_$eps")
      val est = st.stickyFrequent(phi, eps)
      val trueF = st.exactFrequent(phi)
      info(f"eps=$eps%.2f estimated=${est.size}%2d true-among=${est.count(trueF.contains)}%2d")
      (eps, est, trueF, st)
    }
    // ground truth: exactly the 10 planted heavy items
    results.foreach { case (_, _, trueF, _) =>
      assert(trueF == (1L to 10L), s"true frequent set wrong: $trueF") }
    // every eps finds ALL true items (the "/10" column of the table)
    results.foreach { case (eps, est, trueF, _) =>
      assert(trueF.forall(est.contains), s"eps=$eps missed true items: $est") }
    // estimated count shrinks monotonically as eps tightens...
    val sizes = results.map(_._2.size)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b <= a },
      s"estimated counts not monotone: $sizes")
    // ...to EXACT recovery at eps=0.03 (the 10/10 signature)
    assert(results.last._2 == (1L to 10L),
      s"eps=0.03 not exact: ${results.last._2}")
    // reservoir quality at m=ceil(1/phi)=15 (the golden-output shape:
    // most distinct slots are true-frequent — heavy items carry 75%
    // of the stream): identical across runs (same seed, same stream)
    val res = results.head._4.reservoirItems
    val resTrue = res.count((1L to 10L).contains)
    info(s"reservoir: ${res.size} distinct, $resTrue true-frequent")
    assert(res.size <= 15 && resTrue >= 6,
      s"reservoir quality off: $res")
  }

  test("streaming groupBy(item).count in complete mode == batch histogram (A7 streaming twin)") {
    val tmp = Files.createTempDirectory("graft_sfreq").toString
    val rnd = new scala.util.Random(23)
    val xs = (0L until 1200L).map(i => (i, (rnd.nextInt(25) + 1).toLong))
    writeChunks(s"$tmp/in", xs, 4)
    val agg = Bounded.fileStream(spark, s"$tmp/in/chunk_*")
      .groupBy("item").count()
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("freq_stream_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("freq_stream_out")
      .as[(Long, Long)].collect().toMap
    val batch = xs.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    assert(streamed == batch)
  }

  test("n-cap: only first n items processed (St2/St4)") {
    val xs = (0L until 100L).map(i => (i, i % 7))
    val s = Bounded.batchTwin(xs.toDF("ord", "item"), 50L, 5, 1.0, 1L)
    assert(s.seen == 50L)
    assert(s.histogram.values.sum == 50L)
    // with p=1 sticky == exact histogram of the first 50
    assert(s.sticky == s.histogram)
  }

  test("exactFrequent matches relational threshold on the capped prefix") {
    val xs = (0L until 200L).map(i => (i, if (i % 2 == 0) 1L else (i % 50) + 10L))
    val s = Bounded.batchTwin(xs.toDF("ord", "item"), 200L, 10, 0.5, 3L)
    val rel = graft.ops.Freq.frequentItems(
      xs.toDF("ord", "item"), 0.4).select("item").as[Long].collect().toSet
    assert(s.exactFrequent(0.4).toSet == rel)
    assert(s.reservoirItems.length <= 10)
  }
}
