package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Dev utility: A/B the shared [[graft.functions.BoundedTopK]]
  * accumulator against a hand-inlined copy of the same packed-scan
  * loop — the round-13 refactor extracted the accumulator out of the
  * DotTopK/PqAdcTopK hot loops (one object + per-candidate `offer`
  * where the insert logic was inlined), and the bench showed ann_ivf/
  * ann_ivfadc ≈ +9..13% the same round; this isolates whether any of
  * that is the accumulator (JIT should inline a final class'
  * monomorphic calls) or bench artifact.
  *
  * Times `DotTopK.scan` (production code, through the accumulator)
  * against an inlined twin on identical segment data at dim 64 and
  * 256, verifying identical outputs. Pure JVM — no Spark session.
  *
  * Usage: `runMain graft.TopKAbProbe [iters]`
  */
object TopKAbProbe {
  /** The PRE-refactor shape: insert/settle logic inlined in the loop. */
  private def scanInlined(packed: ArrayData, ids: ArrayData, q: ArrayData,
                          k0: Int): ArrayData = {
    val n = ids.numElements()
    val dim = q.numElements()
    val k = math.min(k0, n)
    val topIds = new Array[Long](k)
    val topSc = new Array[Double](k)
    var filled = 0
    var worst = 0
    def beats(sA: Double, iA: Long, sB: Double, iB: Long): Boolean =
      sA > sB || (sA == sB && iA < iB)
    def settleWorst(): Unit = {
      var w = 0; var t = 1
      while (t < filled) {
        if (beats(topSc(w), topIds(w), topSc(t), topIds(t))) w = t
        t += 1
      }
      worst = w
    }
    var i = 0
    while (i < n) {
      var s = 0.0
      val off = i * dim
      var j = 0
      while (j < dim) { s += q.getDouble(j) * packed.getDouble(off + j); j += 1 }
      val id = ids.getLong(i)
      if (filled < k) {
        topIds(filled) = id; topSc(filled) = s
        filled += 1
        if (filled == k) settleWorst()
      } else if (beats(s, id, topSc(worst), topIds(worst))) {
        topIds(worst) = id; topSc(worst) = s
        settleWorst()
      }
      i += 1
    }
    val order = Array.range(0, filled).sortWith { (a, b) =>
      beats(topSc(a), topIds(a), topSc(b), topIds(b))
    }
    new GenericArrayData(
      order.map(ix => org.apache.spark.sql.catalyst.InternalRow(
        topIds(ix), topSc(ix)): Any))
  }

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 200
    val rnd = new java.util.Random(42L)
    for (dim <- Seq(64, 256)) {
      // one auto-sized segment's worth of entries (ivfPack's 4 MiB row)
      val n = math.max(256, (1 << 22) / (dim * 8))
      val packed = new GenericArrayData(
        Array.fill(n * dim)(rnd.nextGaussian()))
      val ids = new GenericArrayData(Array.tabulate(n)(_.toLong))
      val q = new GenericArrayData(Array.fill(dim)(rnd.nextGaussian()))
      val k = 4
      def fmt(a: ArrayData): String =
        (0 until a.numElements()).map { i =>
          val r = a.getStruct(i, 2); s"${r.getLong(0)}:${r.getDouble(1)}"
        }.mkString(",")
      require(fmt(graft.functions.DotTopK.scan(packed, ids, q, k)) ==
        fmt(scanInlined(packed, ids, q, k)),
        "A/B twins disagree — the inlined copy drifted from production")
      def time(body: => Unit): Double = {
        var w = 0
        while (w < iters / 4) { body; w += 1 } // warm (JIT compile both)
        val t0 = System.nanoTime()
        var i = 0
        while (i < iters) { body; i += 1 }
        (System.nanoTime() - t0) / 1e9
      }
      // interleave A and B twice to cancel compilation-order effects
      val a1 = time(graft.functions.DotTopK.scan(packed, ids, q, k))
      val b1 = time(scanInlined(packed, ids, q, k))
      val a2 = time(graft.functions.DotTopK.scan(packed, ids, q, k))
      val b2 = time(scanInlined(packed, ids, q, k))
      val a = math.min(a1, a2); val b = math.min(b1, b2)
      println(f"TOPK_AB dim=$dim n=$n iters=$iters " +
        f"accumulator=${a}%.3fs inlined=${b}%.3fs ratio=${a / b}%.3f")
    }
  }
}
