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
