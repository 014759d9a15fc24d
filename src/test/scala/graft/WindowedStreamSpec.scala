package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Event-time windowed streaming aggregation with watermark (absent in
  * the reference — SURVEY.md §2.7 St7 — but part of the engine's
  * streaming surface via Structured Streaming built-ins): a tumbling
  * 1-minute window count over a file-chunk stream must equal the same
  * window aggregation run in batch. */
class WindowedStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling-window counts == batch window counts") {
    val tmp = Files.createTempDirectory("graft_win").toString
    val rnd = new scala.util.Random(31)
    val t0 = 1700000000000L
    val rows = (0 until 600).map { i =>
      (new Timestamp(t0 + i * 997L + rnd.nextInt(500)), s"type${i % 3}", rnd.nextDouble())
    }
    rows.grouped(200).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("ts", "event_type", "value").coalesce(1)
        .write.parquet(s"$tmp/in/chunk_$i")
      Thread.sleep(5)
    }

    val schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_out")
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = rows.toDF("ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming SLIDING-window counts == batch sliding window counts") {
    // the overlapping-window face (window_sliding_events' streaming
    // twin): every event lands in window/slide = 2 windows
    val tmp = Files.createTempDirectory("graft_slide").toString
    val rnd = new scala.util.Random(37)
    val t0 = 1700000000000L
    val rows = (0 until 600).map { i =>
      (new Timestamp(t0 + i * 997L + rnd.nextInt(500)), s"type${i % 3}", rnd.nextDouble())
    }
    rows.grouped(200).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("ts", "event_type", "value").coalesce(1)
        .write.parquet(s"$tmp/in/chunk_$i")
      Thread.sleep(5)
    }

    val schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"
    def slide(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "2 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val stream = slide(spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "10 minutes"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("slide_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("slide_out")
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = slide(rows.toDF("ts", "event_type", "value"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
    // overlap sanity: ~2x as many window rows as events-per-window
    // groups in a tumbling layout (each event in exactly 2 windows)
    assert(streamed.map(_._1).size > rows.map(_._1.getTime / 120000L).distinct.size)
  }

  test("streaming session windows (30s gap, watermark) == batch session_window") {
    // the streaming face of sessionize_events: Spark's session_window
    // maintains merging session state per key under a watermark;
    // append mode emits each session once it can no longer grow
    val tmp = Files.createTempDirectory("graft_sess").toString
    val rnd = new scala.util.Random(47)
    val t0 = 1700000000000L
    // 5 users, bursts with gaps > 30s between them
    val rows = (0 until 400).map { i =>
      val burst = i / 40                       // 10 bursts
      val off = burst * 120000L + rnd.nextInt(20000) // bursts 2 min apart, 20s jitter
      (new Timestamp(t0 + off), (i % 5).toLong, rnd.nextDouble())
    }
    // one chunk per burst: every file is strictly newer than the
    // previous one, so no row ever falls behind the advancing
    // watermark (in-order arrival — the late-data DROP path is
    // exercised by the sentinel logic below, not here). The file
    // source orders by MODIFICATION time — pin it explicitly so a
    // coarse-mtime filesystem can't reorder two fast writes.
    rows.grouped(40).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("ts", "user_id", "value").coalesce(1)
        .write.parquet(s"$tmp/in/chunk_$i")
      val dir = new java.io.File(s"$tmp/in/chunk_$i")
      (dir +: dir.listFiles().toSeq).foreach(_.setLastModified(1000000L + i * 10000L))
    }
    // a final late chunk far in the future closes every session
    Seq((new Timestamp(t0 + 3600000L), 99L, 0.0)).toDF("ts", "user_id", "value")
      .coalesce(1).write.parquet(s"$tmp/in/chunk_z")
    val zdir = new java.io.File(s"$tmp/in/chunk_z")
    (zdir +: zdir.listFiles().toSeq).foreach(_.setLastModified(2000000L))

    val schema = "ts TIMESTAMP, user_id LONG, value DOUBLE"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "5 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ws"), col("n"))

    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_out")
      .as[(Long, Timestamp, Long)].collect().toSet
    val batch = rows.toDF("ts", "user_id", "value")
      .groupBy(col("user_id"), session_window(col("ts"), "30 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ws"), col("n"))
      .as[(Long, Timestamp, Long)].collect().toSet
    // every batch session must be emitted by the stream (the sentinel
    // user 99's own session may or may not flush — ignore it)
    val streamedReal = streamed.filterNot(_._1 == 99L)
    val batchReal = batch.filterNot(_._1 == 99L)
    assert(streamedReal == batchReal)
    assert(streamedReal.nonEmpty)
  }

  test("flatMapGroupsWithState sessions == independently computed batch sessions") {
    // the CUSTOM-STATE sessionizer (StatefulSessions) against a twin
    // computed directly from the rows (sort per user, split on gap) —
    // no session_window on either side, so the two formulations are
    // independent
    val tmp = Files.createTempDirectory("graft_fmgs").toString
    val rnd = new scala.util.Random(61)
    val t0 = 1700000000000L
    val rows = (0 until 400).map { i =>
      val burst = i / 40
      val off = burst * 120000L + rnd.nextInt(20000)
      (new Timestamp(t0 + off), (i % 5).toLong, rnd.nextDouble())
    }
    rows.grouped(40).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("ts", "user_id", "value").coalesce(1)
        .write.parquet(s"$tmp/in/chunk_$i")
      val dir = new java.io.File(s"$tmp/in/chunk_$i")
      (dir +: dir.listFiles().toSeq).foreach(_.setLastModified(1000000L + i * 10000L))
    }
    // far-future sentinel advances the watermark past last+gap for
    // every open session -> they all close via event-time timeout
    Seq((new Timestamp(t0 + 3600000L), 99L, 0.0)).toDF("ts", "user_id", "value")
      .coalesce(1).write.parquet(s"$tmp/in/chunk_z")
    val zdir = new java.io.File(s"$tmp/in/chunk_z")
    (zdir +: zdir.listFiles().toSeq).foreach(_.setLastModified(2000000L))

    val gapMs = 30000L
    val schema = "ts TIMESTAMP, user_id LONG, value DOUBLE"
    val in = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "5 seconds")
    val q = graft.streaming.StatefulSessions.sessions(in, gapMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fmgs_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("fmgs_out")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      .filterNot(_._1 == 99L)
    // independent twin: plain Scala over the raw rows
    val expected = rows.groupBy(_._2).flatMap { case (user, rs) =>
      val ts = rs.map(_._1.getTime).sorted
      val sessions = ts.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, t) => acc match {
          case (s, l, n) :: rest if t - l < gapMs => (s, t, n + 1) :: rest
          case _ => (t, t, 1L) :: acc
        }
      }
      sessions.map { case (s, l, n) =>
        (user, new Timestamp(s), new Timestamp(l), n)
      }
    }.toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("windowed aggregation drops behind-watermark rows (append mode)") {
    // the AGGREGATION twin of the fMGWS straggler pin below: a row
    // arriving behind the watermark must not update a window that was
    // already finalized and emitted — Spark's late-event filter drops
    // it before the stateful aggregation.
    val tmp = Files.createTempDirectory("graft_win_late").toString
    val t0 = 1700000000000L
    def writeChunk(name: String, mtime: Long, rows: Seq[(Timestamp, Long)]): Unit = {
      rows.toDF("ts", "v").coalesce(1).write.parquet(s"$tmp/in/$name")
      val dir = new java.io.File(s"$tmp/in/$name")
      (dir +: dir.listFiles().toSeq).foreach(_.setLastModified(mtime))
    }
    // a: 3 rows in minute-0 window W0. b: sentinel 10 min later — the
    // watermark passes W0's end, so append mode finalizes + emits W0
    // with n=3. c: second far-future row — the watermark update from
    // b's data is applied from THIS batch on (same one-batch settling
    // the fMGWS pin below uses). d: late row back inside W0, behind
    // the watermark — dropped; W0 must NOT be re-emitted or corrected.
    writeChunk("chunk_a", 1000000L,
      Seq((new Timestamp(t0), 1L), (new Timestamp(t0 + 1000L), 2L),
        (new Timestamp(t0 + 2000L), 3L)))
    writeChunk("chunk_b", 1010000L, Seq((new Timestamp(t0 + 600000L), 9L)))
    writeChunk("chunk_c", 1020000L, Seq((new Timestamp(t0 + 601000L), 8L)))
    writeChunk("chunk_d", 1030000L, Seq((new Timestamp(t0 + 3000L), 4L)))

    val schema = "ts TIMESTAMP, v LONG"
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("win_late_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    assert(q.isActive, "late row is dropped, not an error")
    q.stop()

    val out = spark.table("win_late_out").as[(Timestamp, Long)].collect().toSeq
    // exactly the finalized W0 with the THREE in-time rows; the late
    // 4th row left no trace and the sentinel's window never finalized
    val w0 = new Timestamp(t0 - t0 % 60000L) // minute-aligned window start
    assert(out == Seq((w0, 3L)), s"expected only W0 with n=3, got: $out")
  }

  test("sub-watermark straggler is dropped: no overlapping session re-opened") {
    // Under EventTimeTimeout the engine filters rows behind the
    // watermark BEFORE flatMapGroupsWithState sees them (the same
    // late-event predicate watermarked aggregations use). So once a
    // session has closed via event-time timeout and its state is gone,
    // a straggler for that key is silently discarded — it must NOT
    // mint a fresh session overlapping the one already emitted.
    // Pins the contract documented in StatefulSessions' scaladoc.
    val tmp = Files.createTempDirectory("graft_fmgs_late").toString
    val t0 = 1700000000000L
    def writeChunk(name: String, mtime: Long, rows: Seq[(Timestamp, Long, Double)]): Unit = {
      rows.toDF("ts", "user_id", "value").coalesce(1).write.parquet(s"$tmp/in/$name")
      val dir = new java.io.File(s"$tmp/in/$name")
      (dir +: dir.listFiles().toSeq).foreach(_.setLastModified(mtime))
    }
    // a: opens user 1's session. b: sentinel advances the watermark far
    // past last+gap. c: unrelated key — its batch fires user 1's
    // timeout (close + state.remove). d: straggler for user 1 behind
    // the watermark with no state -> dropped by the engine's late
    // filter, never re-opened.
    writeChunk("chunk_a", 1000000L, Seq((new Timestamp(t0), 1L, 0.0)))
    writeChunk("chunk_b", 1010000L, Seq((new Timestamp(t0 + 3600000L), 99L, 0.0)))
    writeChunk("chunk_c", 1020000L, Seq((new Timestamp(t0 + 3601000L), 98L, 0.0)))
    writeChunk("chunk_d", 1030000L, Seq((new Timestamp(t0 + 10000L), 1L, 0.0)))

    val schema = "ts TIMESTAMP, user_id LONG, value DOUBLE"
    val in = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "5 seconds")
    val q = graft.streaming.StatefulSessions.sessions(in, 30000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("fmgs_late_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    assert(q.isActive, "query must stay healthy — the straggler is dropped, not an error")
    q.stop()

    val user1 = spark.table("fmgs_late_out")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
      .filter(_._1 == 1L)
    // exactly the originally-emitted (timed-out) session, nothing from
    // the straggler
    assert(user1 == Seq((1L, new Timestamp(t0), new Timestamp(t0), 1L)),
      s"expected only user 1's timed-out session, got: $user1")
    assert(!user1.exists(_._2.getTime == t0 + 10000L),
      "straggler must not mint a session at its own timestamp")
  }

  test("in-watermark out-of-order arrival fails loudly (session-boundary hazard)") {
    // The residual hazard the engine's late filter does NOT cover: an
    // event AT OR ABOVE the watermark but older than the open
    // session's last event. Silently merging it would corrupt the
    // session's start/end; StatefulSessions errors instead
    // (StatefulSessions.scala out-of-order guard).
    val tmp = Files.createTempDirectory("graft_fmgs_ooo").toString
    val t0 = 1700000000000L
    def writeChunk(name: String, mtime: Long, rows: Seq[(Timestamp, Long, Double)]): Unit = {
      rows.toDF("ts", "user_id", "value").coalesce(1).write.parquet(s"$tmp/in/$name")
      val dir = new java.io.File(s"$tmp/in/$name")
      (dir +: dir.listFiles().toSeq).foreach(_.setLastModified(mtime))
    }
    // a: user 1 at t0+10s -> after the batch the watermark is t0+5s
    // (10s max - 5s delay). b: user 1 at t0+6s — ABOVE the watermark
    // (so the engine's late filter passes it through) but BEHIND the
    // open session's last event (t0+10s) -> the guard must fire.
    writeChunk("chunk_a", 1000000L, Seq((new Timestamp(t0 + 10000L), 1L, 0.0)))
    writeChunk("chunk_b", 1010000L, Seq((new Timestamp(t0 + 6000L), 1L, 0.0)))

    val schema = "ts TIMESTAMP, user_id LONG, value DOUBLE"
    val in = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "5 seconds")
    val q = graft.streaming.StatefulSessions.sessions(in, 30000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("fmgs_ooo_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    val err = intercept[Exception] {
      q.processAllAvailable()      // surfaces the batch's failure...
      q.awaitTermination(60000L)   // ...bounded backstop, never unbounded
      fail("query should have failed on the out-of-order in-watermark event")
    }
    q.stop()
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(err).exists(c =>
      Option(c.getMessage).exists(_.contains("out-of-order arrival"))),
      s"expected the out-of-order-arrival error, got: $err")
  }

  test("restart from checkpoint resumes exactly-once (file sink, windowed agg)") {
    // kill a windowed aggregation mid-stream and restart it on the
    // same checkpoint: already-emitted windows must NOT re-emit (no
    // duplicates in the file sink), pending state must survive (no
    // loss), and the final sink must equal the batch aggregation —
    // the exactly-once recovery contract checkpointing exists for.
    val tmp = Files.createTempDirectory("graft_restart").toString
    val rnd = new scala.util.Random(83)
    val t0 = 1700000000000L
    val rows = (0 until 400).map { i =>
      (new Timestamp(t0 + i * 450L + rnd.nextInt(200)), rnd.nextInt(100).toLong)
    } // ~3 minutes of events, in order
    def writeChunk(name: String, mtime: Long, chunk: Seq[(Timestamp, Long)]): Unit = {
      chunk.toDF("ts", "v").coalesce(1).write.parquet(s"$tmp/in/$name")
      val dir = new java.io.File(s"$tmp/in/$name")
      (dir +: dir.listFiles().toSeq).foreach(_.setLastModified(mtime))
    }
    val chunks = rows.grouped(100).toSeq
    writeChunk("chunk_a", 1000000L, chunks(0))
    writeChunk("chunk_b", 1010000L, chunks(1))

    val schema = "ts TIMESTAMP, v LONG"
    def startQ() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .select(col("window.start").as("ws"), col("n"), col("sv"))
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()

    val q1 = startQ()
    q1.processAllAvailable()
    q1.stop() // "crash" after the first half
    writeChunk("chunk_c", 1020000L, chunks(2))
    writeChunk("chunk_d", 1030000L, chunks(3))
    // far-future sentinel finalizes every real window
    writeChunk("chunk_z", 1040000L, Seq((new Timestamp(t0 + 3600000L), 0L)))
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(s"$tmp/out")
      .as[(Timestamp, Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, s"duplicate windows after restart: $got")
    val batch = rows.toDF("ts", "v")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .select(col("window.start").as("ws"), col("n"), col("sv"))
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(got.toSet == batch,
      s"restart lost or corrupted state: got ${got.toSet.size} windows, want ${batch.size}")
  }

  test("stream-stream time-bounded join == batch join (watermarked state both sides)") {
    // the attribution shape: impressions joined to clicks that happen
    // within 60s after them, both sides streaming — Spark buffers each
    // side in watermarked state and emits matches as they meet. The
    // result must equal the same time-range join run in batch.
    val tmp = Files.createTempDirectory("graft_ssj").toString
    val rnd = new scala.util.Random(71)
    val t0 = 1700000000000L
    val imps = (0 until 200).map { i =>
      (i.toLong, (i % 20).toLong, new Timestamp(t0 + i * 500L))
    } // imp_id, user, its
    val clicks = (0 until 150).map { i =>
      (i.toLong, (i % 20).toLong, new Timestamp(t0 + i * 700L + rnd.nextInt(2000)))
    } // click_id, user, cts
    imps.grouped(50).zipWithIndex.foreach { case (c, i) =>
      c.toDF("imp_id", "iuser", "its").coalesce(1).write.parquet(s"$tmp/imp/chunk_$i") }
    clicks.grouped(50).zipWithIndex.foreach { case (c, i) =>
      c.toDF("click_id", "cuser", "cts").coalesce(1).write.parquet(s"$tmp/clk/chunk_$i") }

    def src(dir: String, ddl: String) = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val impS = src(s"$tmp/imp/chunk_*", "imp_id BIGINT, iuser BIGINT, its TIMESTAMP")
      .withWatermark("its", "1 minute")
    val clkS = src(s"$tmp/clk/chunk_*", "click_id BIGINT, cuser BIGINT, cts TIMESTAMP")
      .withWatermark("cts", "1 minute")
    val joined = impS.join(clkS,
      expr("iuser = cuser AND cts >= its AND cts <= its + interval 60 seconds"))
    val q = joined.select("imp_id", "click_id").writeStream
      .outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ssj_out").as[(Long, Long)].collect().toSet
    val batch = imps.toDF("imp_id", "iuser", "its")
      .join(clicks.toDF("click_id", "cuser", "cts"), col("iuser") === col("cuser"))
      .where(col("cts") >= col("its")
        && col("cts") <= col("its") + expr("interval 60 seconds"))
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-static enrichment join == batch join (dim broadcast per micro-batch)") {
    // the standard streaming enrichment: micro-batched fact stream
    // joined to a static dimension table, aggregated per dim attribute
    val tmp = Files.createTempDirectory("graft_enrich").toString
    val dim = (0L until 20L).map(i => (i, s"seg${i % 4}")).toDF("user_id", "segment")
    val rnd = new scala.util.Random(53)
    val facts = (0 until 300).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong))
    facts.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("user_id", "v").coalesce(1).write.parquet(s"$tmp/in/chunk_$i")
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("user_id LONG, v LONG"))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
      .join(dim, Seq("user_id")) // stream-static: dim re-read per batch
      .groupBy("segment").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("enrich_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrich_out")
      .as[(String, Long, Long)].collect().toSet
    val batch = facts.toDF("user_id", "v").join(dim, Seq("user_id"))
      .groupBy("segment").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.size == 4)
  }
}
