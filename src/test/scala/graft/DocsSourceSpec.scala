package graft

import graft.queries.Tables
import graft.sources.Docs
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** JSONL/CSV corpus sources: parquet→JSONL→scan roundtrip is
  * value-exact, malformed lines quarantine (PERMISSIVE) or kill the
  * job (FAILFAST), and the scan parallelizes. */
class DocsSourceSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL roundtrip: write the documents table, read it back value-exact") {
    val tmp = Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
    Docs.toJsonl(docs, s"$tmp/docs", numFiles = 4)
    // corrupt-column-only pruned scans are disallowed (Spark's
    // QUERY_ONLY_CORRUPT_RECORD_COLUMN rule) — cache the parsed scan
    val back = Docs.fromJsonl(spark, s"$tmp/docs").cache()
    assert(back.where(col("_corrupt").isNotNull).count() == 0)
    val a = docs.as[(Long, String, String, String, Long)].collect().toSet
    val b = back.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(a == b)
    // multiple part files: the sink split the write
    val parts = new java.io.File(s"$tmp/docs").listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts == 4, s"expected 4 part files, got $parts")
  }

  test("malformed JSONL: PERMISSIVE quarantines the line, FAILFAST fails loudly") {
    val tmp = Files.createTempDirectory("graft_badjsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""",
      """{"doc_id": oops not json""",
      """{"doc_id": 3, "text": "fine", "lang": "en", "source": "s", "n_chars": 4}""")
    Files.write(java.nio.file.Paths.get(tmp, "corpus.jsonl"),
      String.join("\n", lines: _*).getBytes)
    val perm = Docs.fromJsonl(spark, s"$tmp/corpus.jsonl").cache()
    assert(perm.where(col("_corrupt").isNotNull).count() == 1)
    assert(perm.where(col("_corrupt").isNull).count() == 2)
    assert(perm.where(col("doc_id") === 1).select("text").as[String].head() == "ok")
    val e = intercept[Exception] {
      Docs.fromJsonl(spark, s"$tmp/corpus.jsonl", mode = "FAILFAST").count()
    }
    assert(msgs(e).exists(m => m.contains("FAILFAST") || m.contains("Malformed")),
      e.getMessage)
  }

  test("CSV corpus scan with declared schema (no inference)") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .limit(50)
      .write.option("header", "true").option("escape", "\"").csv(s"$tmp/docs")
    val back = Docs.fromCsv(spark, s"$tmp/docs").cache()
    assert(back.count() == 50)
    assert(back.where(col("_corrupt").isNotNull).count() == 0)
    assert(back.schema("doc_id").dataType.typeName == "long") // declared, not inferred
  }
}
