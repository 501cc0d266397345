package graft.functions

/** Data-layout keys for multi-dimensional clustering.
  *
  * Z-order (Morton) interleaving is the key Delta/Iceberg OPTIMIZE ZORDER
  * writes tables by: range-partitioning on the interleaved key gives every
  * output file a tight min/max envelope in EVERY participating dimension,
  * so a filter on any of them prunes files — where a lexicographic sort
  * only ever prunes its leading column. The key here is built from pure
  * integer arithmetic (`(x div 2^i) % 2`, scaled by `4^i`) rather than
  * shift builtins, so ONE expression string parses identically in Spark
  * and DuckDB (the engine-portability discipline of QaSampling.wilson).
  */
object Layout {

  /** SQL text computing the 2-D Morton key of non-negative integer columns
    * `x` and `y` (low `bits` bits each; callers normalize/clamp first).
    * x occupies even bit positions, y odd. */
  def zOrderSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      val d = 1L << i      // 2^i
      val m = 1L << (2 * i) // 4^i
      Seq(s"(($x div $d) % 2) * $m", s"(($y div $d) % 2) * ${2 * m}")
    }
    terms.mkString("CAST(", " + ", " AS BIGINT)")
  }

  /** The same text with DuckDB's integer-division spelling. */
  def zOrderSqlDuck(x: String, y: String, bits: Int): String =
    zOrderSql(x, y, bits).replace(" div ", " // ")
}
