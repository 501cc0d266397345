package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Layout]] — the Morton (Z-order) key: locality and bit-interleave
  * correctness of the portable div/mod arithmetic form. */
class LayoutSpec extends SparkSpec {

  private def zkeys(pts: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    import spark.implicits._
    pts.toDF("x", "y")
      .withColumn("z", expr(Layout.zOrderSql("x", "y", 8)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("bit interleave matches the reference definition") {
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i =>
        (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val pts = for (x <- 0L to 16L; y <- 0L to 16L) yield (x, y)
    val got = zkeys(pts)
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"($x,$y)")
    }
  }

  test("quadrant locality: every key of a 2^k-aligned quadrant is contiguous") {
    // the defining Z-order property: an aligned 8x8 quadrant occupies one
    // contiguous key range, so range partition pruning covers BOTH dims
    val quad = for (x <- 8L until 16L; y <- 8L until 16L) yield (x, y)
    val rest = Seq((7L, 8L), (8L, 7L), (16L, 8L), (8L, 16L))
    val keys = zkeys(quad ++ rest)
    val qk = quad.map(keys)
    val (lo, hi) = (qk.min, qk.max)
    assert(hi - lo == 63) // 64 cells, dense range
    rest.foreach(p => assert(keys(p) < lo || keys(p) > hi))
  }
}
