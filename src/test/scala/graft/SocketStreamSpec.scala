package graft

import graft.streaming.Bounded
import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files

/** Live-socket bounded stream (S2/St2): a local replayer feeds
  * integers over TCP; the runner must stop at n items, lose nothing,
  * and duplicate nothing. (Within-batch ORDER follows the socket
  * source's partition layout — same nondeterminism class as the
  * reference's `batch.take` — so order-sensitive state is checked at
  * multiset/law level, exact order parity is covered by the
  * file-source test in BoundedStreamSpec.) */
class SocketStreamSpec extends SparkSpec {
  import spark.implicits._

  test("socket stream: stops at n, exact item multiset, sampling laws hold") {
    val rnd = new scala.util.Random(21)
    val xs = (0 until 400).map(_ => (rnd.nextInt(30) + 1).toLong)
    val server = new ServerSocket(0)
    val writer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        xs.foreach(out.println(_))
        Thread.sleep(30000) // keep open until the reader stops (daemon)
        sock.close()
      } catch { case _: Throwable => () }
    })
    writer.setDaemon(true)
    writer.start()

    val tmp = Files.createTempDirectory("graft_sock").toString
    val m = 10
    val state = Bounded.runUnordered(
      Bounded.socketStream(spark, "localhost", server.getLocalPort),
      n = 400L, m = m, stickyP = 0.3, seed = 5L, checkpointDir = s"$tmp/ckpt")
    server.close()

    assert(state.seen == 400L)
    // nothing lost, nothing duplicated: exact multiset of all written items
    val expected = xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(state.histogram.toMap == expected)
    // sampling laws (order-insensitive)
    assert(state.reservoir.length == m)
    assert(state.reservoir.forall(xs.contains))
    state.sticky.foreach { case (item, cnt) =>
      assert(cnt >= 1 && cnt <= expected(item), s"sticky $item=$cnt")
    }
    // exact frequent items from the full histogram match a direct count
    val trueFreq = expected.collect { case (k, c) if c >= 0.05 * 400 => k }.toSet
    assert(state.exactFrequent(0.05).toSet == trueFreq)
  }
}
