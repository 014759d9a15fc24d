package graft.queries

import graft.ops.{Grid, Outliers}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the HW1/HW2 outlier surface
  * (SURVEY.md §2: P3, A2/A3, A5, J1, J2, A8, T1, T2).
  *
  * Fixed parameters (chosen so results are non-trivial at sf0.001 and
  * the grid join stays bounded at sf0.1): D_approx = 2.0, D_exact = 0.5,
  * M = 10, K = 20.
  */
object OutlierQueries extends QueryPack {
  private val D  = 2.0
  private val DX = 0.5
  private val M  = 10
  private val K  = 20

  // SQL mirror of Grid.sideFor(D) — both engines evaluate the same
  // IEEE expression, so floor() boundaries agree bit-for-bit.
  private def sideSql(d: String) = s"($d/(2.0*sqrt(2.0)))"

  private def pts(s: SparkSession, d: String): DataFrame = Tables.points(s, d)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P3 + A2/A3: grid cell histogram
    "outlier_cells" -> ((s, d) =>
      Grid.cellHistogram(pts(s, d), Grid.sideFor(D))),
    // layout clustering under the hash gate: the codegen'd Morton
    // z-value of each point's unit cell, aggregated per 256-z-value
    // tile (arithmetic shift — DuckDB's >> matches). The oracle
    // restates the ENTIRE bit interleave in pure SQL (5 spread
    // stages + overflow-safe sign flip) — a fully independent twin.
    "zorder_tiles" -> ((s, d) =>
      pts(s, d)
        .select(Grid.zValue(floor(col("x")).cast("long"),
          floor(col("y")).cast("long")).as("z"))
        .groupBy(shiftright(col("z"), 8).as("tile"))
        .agg(count(lit(1)).as("n"), min("z").as("zmin"), max("z").as("zmax"))),
    // J2: 7×7 neighborhood stats
    "outlier_n3n7" -> ((s, d) =>
      Outliers.cellStats(pts(s, d), D)),
    // A5: sure / uncertain outlier counts
    "outlier_approx_counts" -> ((s, d) =>
      Outliers.approxOutlierCounts(pts(s, d), D, M)),
    // T2: K smallest non-empty cells
    "outlier_cells_topk" -> ((s, d) =>
      Outliers.smallestCells(pts(s, d), D, K)),
    // J1 + A8 + T1: exact outliers via grid-bucketed distance join
    // (unique-id projection: the join and count are per point)
    "outlier_exact" -> ((s, d) =>
      Outliers.exactOutliers(Tables.pointsWithId(s, d), DX, M, K)),
  )

  override def oracles: Map[String, String] = {
    val side = sideSql(D.toString)
    Map(
      "outlier_cells" ->
        s"""WITH pts AS (${Tables.pointsSql})
           |SELECT CAST(floor(x/$side) AS BIGINT) AS ci,
           |       CAST(floor(y/$side) AS BIGINT) AS cj,
           |       count(*) AS sz
           |FROM pts GROUP BY 1, 2""".stripMargin,
      "zorder_tiles" ->
        s"""WITH pts AS (${Tables.pointsSql}),
           |c AS (SELECT CAST(floor(x) AS BIGINT) + 2147483648 AS bi,
           |             CAST(floor(y) AS BIGINT) + 2147483648 AS bj FROM pts),
           |s1 AS (SELECT (bi | (bi << 16)) & 281470681808895 AS a,
           |              (bj | (bj << 16)) & 281470681808895 AS b FROM c),
           |s2 AS (SELECT (a | (a << 8)) & 71777214294589695 AS a,
           |              (b | (b << 8)) & 71777214294589695 AS b FROM s1),
           |s3 AS (SELECT (a | (a << 4)) & 1085102592571150095 AS a,
           |              (b | (b << 4)) & 1085102592571150095 AS b FROM s2),
           |s4 AS (SELECT (a | (a << 2)) & 3689348814741910323 AS a,
           |              (b | (b << 2)) & 3689348814741910323 AS b FROM s3),
           |s5 AS (SELECT (a | (a << 1)) & 6148914691236517205 AS a,
           |              (b | (b << 1)) & 6148914691236517205 AS b FROM s4),
           |z AS (SELECT CASE WHEN (b >> 62) = 1
           |               THEN a + 2 * (b & 4611686018427387903)
           |               ELSE a + 2 * (b & 4611686018427387903)
           |                    - 9223372036854775807 - 1 END AS z
           |      FROM s5)
           |SELECT z >> 8 AS tile, count(*) AS n,
           |       min(z) AS zmin, max(z) AS zmax
           |FROM z GROUP BY 1""".stripMargin,
      "outlier_n3n7" ->
        s"""WITH pts AS (${Tables.pointsSql}),
           |cells AS (
           |  SELECT CAST(floor(x/$side) AS BIGINT) AS ci,
           |         CAST(floor(y/$side) AS BIGINT) AS cj,
           |         count(*) AS sz
           |  FROM pts GROUP BY 1, 2),
           |offs AS (SELECT t1.di, t2.dj
           |         FROM generate_series(-3,3) t1(di)
           |         CROSS JOIN generate_series(-3,3) t2(dj))
           |SELECT c.ci, c.cj, c.sz,
           |       CAST(sum(CASE WHEN abs(o.di) <= 1 AND abs(o.dj) <= 1
           |                THEN n.sz ELSE 0 END) AS BIGINT) AS n3,
           |       CAST(sum(n.sz) AS BIGINT) AS n7
           |FROM cells c
           |CROSS JOIN offs o
           |JOIN cells n ON n.ci = c.ci + o.di AND n.cj = c.cj + o.dj
           |GROUP BY c.ci, c.cj, c.sz""".stripMargin,
      "outlier_approx_counts" ->
        s"""WITH pts AS (${Tables.pointsSql}),
           |cells AS (
           |  SELECT CAST(floor(x/$side) AS BIGINT) AS ci,
           |         CAST(floor(y/$side) AS BIGINT) AS cj,
           |         count(*) AS sz
           |  FROM pts GROUP BY 1, 2),
           |offs AS (SELECT t1.di, t2.dj
           |         FROM generate_series(-3,3) t1(di)
           |         CROSS JOIN generate_series(-3,3) t2(dj)),
           |stats AS (
           |  SELECT c.ci, c.cj, c.sz,
           |         sum(CASE WHEN abs(o.di) <= 1 AND abs(o.dj) <= 1
           |                  THEN n.sz ELSE 0 END) AS n3,
           |         sum(n.sz) AS n7
           |  FROM cells c
           |  CROSS JOIN offs o
           |  JOIN cells n ON n.ci = c.ci + o.di AND n.cj = c.cj + o.dj
           |  GROUP BY c.ci, c.cj, c.sz)
           |SELECT CAST(coalesce(sum(CASE WHEN n7 <= $M THEN sz END), 0) AS BIGINT) AS sure,
           |       CAST(coalesce(sum(CASE WHEN n3 <= $M AND n7 > $M THEN sz END), 0) AS BIGINT) AS uncertain
           |FROM stats""".stripMargin,
      "outlier_cells_topk" ->
        s"""WITH pts AS (${Tables.pointsSql})
           |SELECT CAST(floor(x/$side) AS BIGINT) AS ci,
           |       CAST(floor(y/$side) AS BIGINT) AS cj,
           |       count(*) AS sz
           |FROM pts GROUP BY 1, 2
           |ORDER BY sz, ci, cj LIMIT $K""".stripMargin,
      "outlier_exact" ->
        s"""WITH pts AS (${Tables.pointsWithIdSql}),
           |b AS (SELECT id, x, y,
           |             CAST(floor(x/$DX) AS BIGINT) AS bi,
           |             CAST(floor(y/$DX) AS BIGINT) AS bj
           |      FROM pts),
           |offs AS (SELECT t1.di, t2.dj
           |         FROM generate_series(-1,1) t1(di)
           |         CROSS JOIN generate_series(-1,1) t2(dj)),
           |probe AS (SELECT p.id, p.x, p.y, p.bi + o.di AS bi, p.bj + o.dj AS bj
           |          FROM b p CROSS JOIN offs o),
           |cnts AS (
           |  SELECT probe.id, count(*) AS cnt
           |  FROM probe JOIN b q ON probe.bi = q.bi AND probe.bj = q.bj
           |  WHERE (probe.x - q.x)*(probe.x - q.x)
           |      + (probe.y - q.y)*(probe.y - q.y) <= ${DX * DX}
           |  GROUP BY probe.id)
           |SELECT id, cnt FROM cnts WHERE cnt <= $M
           |ORDER BY cnt, id LIMIT $K""".stripMargin,
    )
  }
}
