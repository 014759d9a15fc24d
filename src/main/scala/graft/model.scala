package graft

/** Core data model of the engine.
  *
  * The reference operates on 2-D points parsed from CSV
  * (`HWK_1/G029HW1.py:145`, `HWK_2/G029HW2.py:155`) — here a typed
  * case class backing `Dataset[Point]` where algorithm kernels (FFT)
  * need object access, while the relational surface stays DataFrame.
  */
case class Point(x: Double, y: Double)

object Point {
  /** Squared Euclidean distance — compared against D² to avoid sqrt
    * in hot loops (semantics-preserving vs `math.dist`,
    * `HWK_1/G029HW1.py:27`). */
  @inline def distSq(ax: Double, ay: Double, bx: Double, by: Double): Double = {
    val dx = ax - bx; val dy = ay - by
    dx * dx + dy * dy
  }
  @inline def distSq(a: Point, b: Point): Double = distSq(a.x, a.y, b.x, b.y)
}

/** Parameters of the (D,M)-outlier queries (`HWK_1/G029HW1.py:123-136`). */
case class OutlierParams(d: Double, m: Int, k: Int, l: Int)

/** Parameters of the streaming frequent-items queries
  * (`HWK_3/G029HW3.py:70-78`). */
case class FreqParams(n: Long, phi: Double, eps: Double, delta: Double)
