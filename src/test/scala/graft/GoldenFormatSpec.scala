package graft

import graft.pipelines.Hw3
import org.apache.spark.sql.functions._

/** Byte-level STRUCTURE parity with the reference's committed HW3
  * outputs (`HWK_3/output_examples/Output1M_007_003_01_888{6,8}.txt`).
  * The item VALUES are unreproducible (the university stream host is
  * unreachable), but the line skeleton — section headers, `m = …` line,
  * `item +/-` layout, ordering — is fully specified by the goldens and
  * must match verbatim.
  *
  * Skeleton = each line with numbers replaced by `#`, the +/- truth
  * annotation by `?`, then consecutive identical lines collapsed (item
  * blocks have data-dependent length).
  */
class GoldenFormatSpec extends SparkSpec {

  private val goldenDir = "/root/reference/HWK_3/output_examples"
  private val goldens = Seq("Output1M_007_003_01_8886.txt", "Output1M_007_003_01_8888.txt")

  private val expectedSkeleton = Seq(
    "INPUT PROPERTIES",
    "n = # phi = # epsilon = # delta = # port = #",
    "EXACT ALGORITHM",
    "Number of items in the data structure = #",
    "Number of true frequent items = #",
    "True frequent items:",
    "#",
    "RESERVOIR SAMPLING",
    "Size m of the sample = #",
    "Number of estimated frequent items = #",
    "Estimated frequent items:",
    "# ?",
    "STICKY SAMPLING",
    "Number of items in the Hash Table = #",
    "Number of estimated frequent items = #",
    "Estimated frequent items:",
    "# ?")

  private def skeleton(lines: Seq[String]): Seq[String] = {
    val norm = lines
      .map(_.replaceAll("[+-]$", "?"))
      .map(_.replaceAll("-?\\d+(\\.\\d+)?([eE]-?\\d+)?", "#"))
    // collapse runs of identical lines (variable-length item blocks)
    norm.foldLeft(List.empty[String]) {
      case (acc, l) if acc.headOption.contains(l) => acc
      case (acc, l)                               => l :: acc
    }.reverse
  }

  private def readGolden(name: String): Seq[String] =
    scala.io.Source.fromFile(s"$goldenDir/$name").getLines().toSeq
      .reverse.dropWhile(_.trim.isEmpty).reverse

  test("both committed goldens parse under the report grammar") {
    for (g <- goldens)
      assert(skeleton(readGolden(g)) == expectedSkeleton, s"golden $g")
  }

  test("Hw3 report emits the exact golden line skeleton") {
    import spark.implicits._
    // skewed synthetic stream: item 1 holds half the mass, so every
    // section's item block is deterministically non-empty
    val items = (1L to 2000L)
      .map(i => (i, if (i % 2 == 0) 1L else i))
      .toDF("ord", "item")
    val lines = Hw3.run(items, 2000L, 0.07, 0.03, 0.1, port = "8886")
    assert(skeleton(lines) == expectedSkeleton,
      s"report skeleton diverged:\n${skeleton(lines).mkString("\n")}")
    // and the golden's verbatim header lines appear verbatim in ours
    val headers = Set("INPUT PROPERTIES", "EXACT ALGORITHM", "True frequent items:",
      "RESERVOIR SAMPLING", "STICKY SAMPLING", "Estimated frequent items:")
    assert(headers.forall(lines.contains), "missing verbatim section header")
  }
}
