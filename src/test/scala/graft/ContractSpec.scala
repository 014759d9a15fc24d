package graft

/** Driver-contract guards: every registered query must ANALYZE against
  * the real testdata (unresolved columns fail here in milliseconds,
  * not in the driver's verify run), oracle keys must reference
  * existing queries, and output schemas must be hash-compare-safe
  * (no duplicate column names, no case collisions). */
class ContractSpec extends SparkSpec {

  test("every query analyzes at sf0.001 with a sane output schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sf0001).schema // analysis only, no execution
      val names = schema.fieldNames.map(_.toLowerCase)
      assert(names.nonEmpty, s"$name: empty schema")
      assert(names.distinct.length == names.length,
        s"$name: duplicate output columns ${names.mkString(",")}")
    }
  }

  test("every oracle key has a query; flagship entry is registered") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    assert(qs.contains("outlier_n3n7")) // entry()'s query
  }

  test("multisetDiffViolations: empty iff equal, tags name the surplus side") {
    import spark.implicits._
    import graft.queries.CheckQueries.multisetDiffViolations
    val a = Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("id", "v")
    val b = Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("id", "v")
    assert(multisetDiffViolations(a, b, "extra", "missing").count() === 0)
    // a surplus copy on the left tags extra; a left-absent value tags
    // missing — multiplicity differences count, not just set membership
    val c = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val d = Seq((1L, "x"), (3L, "z")).toDF("id", "v")
    val out = multisetDiffViolations(a, c, "extra", "missing")
      .as[String].collect().toSeq
    assert(out === Seq("extra"), s"dup-copy diff: $out")
    val out2 = multisetDiffViolations(c, d, "extra", "missing")
      .as[String].collect().sorted.toSeq
    assert(out2 === Seq("extra", "missing"), s"value diff: $out2")
  }

  test("oracle SQL mentions only real table names") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      // invariant-check oracles are the constant empty set (no table)
      assert(tables.exists(lower.contains) || lower.contains("where 1 = 0"),
        s"$name references no known table")
    }
  }
}
