package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure the routed semantic quantizer's SPILL COST at
  * an arbitrary scale — the SCALING.md watch item: child-slot
  * inflation (slots/k) grows slowly with the coarse-cell count at a
  * fixed spill, so the routed advantage over flat assignment is
  * √k / (nRoute·inflation) and the constant needs periodic
  * re-measurement as k grows.
  *
  * Prints one line: n, k, coarse cells, slots, inflation, tree-build
  * seconds, routed (adaptive product config) assignment seconds, flat
  * assignment seconds, and the flat/routed speedup.
  *
  * Usage: `runMain graft.RoutedScaleProbe [n] [minCosine] [dim]`
  * (defaults 600000 — the 30× point — 0.9, and 16). Honors
  * `SPARK_GRAFT_CPUS` like Bench. At the default dim the generator is
  * the same deterministic isotropic dim-16 family as ScalingSpec's
  * `genEmbeddings`, so the 1×/3×/10× rows there and the points
  * printed here are one family; `dim` exists to check that the
  * routed/flat crossing (the `RoutedClustersThreshold` sizing) holds
  * at the production embedding dim — both costs are linear in dim,
  * so the cell-count crossing should be dim-stable, but the tree's
  * per-level overhead is not float work and COULD shift it.
  */
object RoutedScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 600000L
    val t = if (args.length > 1) args(1).toDouble else 0.9
    val dim = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity

    val SEED = 42L
    val vec = transform(sequence(lit(0), lit(dim - 1)), j =>
      ((pmod(xxhash64(col("id"), j, lit(SEED)), lit(2000L)).cast("double")
        / 1000.0) - 1.0).cast("float"))
    // materialized so the three timed passes read identical pinned rows
    val e = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding")).localCheckpoint()
    val k = math.max(4L, n / 128L).toInt
    val spill = Similarity.spillFor(t)
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (tree, buildSec) = timed {
      Similarity.hierarchicalCentroids(e, k, spill = spill)
    }
    val inflation = tree.slots.toDouble / tree.k
    // the product configuration semanticNearDupPairs auto-routes with
    val margin = Similarity.routeMarginFor(t)
    val (_, routedSec) = timed {
      Similarity.semanticAssignRoutedAdaptive(e, tree, nAssign = 3,
        routeMargin = margin, minRoute = 2, maxRoute = 4).count()
    }
    val (_, flatSec) = timed {
      Similarity.semanticAssign(e, tree.concat, nAssign = 3).count()
    }
    println(f"ROUTED_SCALE n=$n dim=$dim k=$k t=$t%.2f spill=$spill%.3f " +
      f"coarse=${tree.coarse.length} kTree=${tree.k} slots=${tree.slots} " +
      f"inflation=${inflation}%.2f buildSec=$buildSec%.1f " +
      f"routedSec=$routedSec%.1f flatSec=$flatSec%.1f " +
      f"speedup=${flatSec / routedSec}%.2f")
    spark.stop()
  }
}
