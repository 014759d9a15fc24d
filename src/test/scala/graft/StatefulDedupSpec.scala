package graft

import graft.streaming.StatefulDedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming keyed-state dedup: across micro-batches, each key is
  * emitted exactly once; the emitted set equals batch DISTINCT. */
class StatefulDedupSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState dedup emits each key once across batches") {
    val tmp = Files.createTempDirectory("graft_sdedup").toString
    val rnd = new scala.util.Random(17)
    val rows = (0L until 900L).map(i => (rnd.nextInt(120).toLong, i)) // key, id
    rows.grouped(300).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("key", "id").coalesce(1).write.parquet(s"$tmp/in/chunk_$i")
      Thread.sleep(5)
    }
    val stream = spark.readStream
      .schema("key BIGINT, id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/chunk_*")
    val q = StatefulDedup.firstArrivals(stream).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("sdedup_out")
      .as[(Long, Long)].collect()
    val distinctKeys = rows.map(_._1).distinct.toSet
    assert(emitted.map(_._1).toSet == distinctKeys)       // every key once...
    assert(emitted.length == distinctKeys.size)           // ...and only once
    // each emitted id belongs to that key
    val byKey = rows.groupBy(_._1)
    emitted.foreach { case (k, id) => assert(byKey(k).exists(_._2 == id)) }
  }
}
