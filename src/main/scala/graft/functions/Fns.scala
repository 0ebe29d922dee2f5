package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared expression helpers.
  *
  * Money/measure arithmetic goes through exact DECIMAL so aggregate results
  * are order-independent and bit-identical to the DuckDB oracle (SURVEY.md
  * §7.4 "oracle parity traps"): double sums depend on partition/merge order,
  * decimal sums do not. Final outputs are cast back to DOUBLE (exact for our
  * value ranges) so the compared schema is plain floating point in both
  * engines.
  */
object Fns {
  /** Exact 2-decimal money/measure cast: sums become order-independent. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small-rate cast (discount/tax in [0,1], 2 decimals). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Order-independent SUM of a 2-decimal measure, surfaced as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** Deterministic AVG: exact decimal sum / count, in double at the end. */
  def avgMoney(c: Column): Column = sum(dec2(c)).cast("double") / count(lit(1))

  /** lineitem revenue term: extendedprice * (1 - discount), exact decimal. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - rate(discount))

  /** SQL text of an exact FLOOR division of an integral expression by a
    * positive constant, in pure long arithmetic. Spark's `div` truncates
    * toward zero, so it disagrees with a mathematical floor on negative
    * inputs (pre-epoch ns timestamps, which EdgeCasesSpec pins as
    * supported). `e - pmod(e, d)` is an exact multiple of `d` for either
    * sign (pmod is non-negative), so the trailing `div` is an exact
    * floor; nothing routes through double, where a ns timestamp
    * (> 2^53) would silently lose precision.
    */
  def floorDivSql(e: String, d: Long): String =
    s"(($e) - pmod(($e), ${d}L)) div ${d}L"

  /** Column form of [[floorDivSql]]: floor(e / d) over longs. */
  def floorDiv(e: String, d: Long): Column = expr(floorDivSql(e, d))

  /** DuckDB twin of [[floorDivSql]]. DuckDB's integer `//` truncates
    * toward zero exactly like Spark's `div` (verified: `(-7) // 2 = -3`),
    * so an oracle that buckets time with bare `//` silently disagrees
    * with the engine's floored buckets below epoch. DuckDB's `%` also
    * truncates, so the non-negative remainder is `((e % d) + d) % d`;
    * subtracting it leaves an exact multiple of `d` and the trailing
    * `//` is then an exact floor — same construction, same integer-only
    * arithmetic as the engine side.
    */
  def floorDivDuckSql(e: String, d: Long): String =
    s"((($e) - (((($e) % $d) + $d) % $d)) // $d)"

  /** Strictly left-to-right dot product over two float-array columns,
    * unrolled so Spark and the SQL oracle share one summation order →
    * bit-identical doubles. `dim` is the fixed embedding dimensionality.
    */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map { i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")
    }.reduceLeft(_ + _)

  /** Self dot product (squared L2 norm), same unrolled form. */
  def norm2Unrolled(a: Column, dim: Int): Column = dotUnrolled(a, a, dim)

  /** SQL mirror of [[dotUnrolled]] for the DuckDB oracle (1-based lists). */
  def dotUnrolledSql(a: String, b: String, dim: Int): String =
    (1 to dim)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  /** 2-D Morton (Z-order) curve via the textbook magic-bits spread
    * (Morton 1966; the shift-or-mask ladder is the standard public
    * bit-twiddling identity). Inputs are masked to 21 bits each so the
    * interleaved code tops out at bit 42 — always a positive BIGINT in
    * both Spark and the DuckDB oracle. Every step is a codegen'd
    * built-in (`shiftleft`/`&`/`|`): the encode stays inside
    * whole-stage codegen, so Z-clustering 100 TB is a pure map-side
    * projection before the range-partitioned write.
    *
    * [[MaintenanceOps]] mirrors the same `(shift, mask)` ladder into
    * DuckDB SQL from these constants, so the two engines cannot drift.
    */
  val MortonMask21: Long = 0x1FFFFFL
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 21 bits of `c` to even bit positions (x -> x_i at 2i). */
  def spreadBits(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(MortonMask21))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Interleaved Z-order code: x on even bits, y on odd bits. */
  def morton2(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))
}
