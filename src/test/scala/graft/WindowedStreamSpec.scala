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
}
