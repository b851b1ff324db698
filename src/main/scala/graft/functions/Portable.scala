package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ENGINE-PORTABLE scalar math shared by an operator's Spark plan and its
  * DuckDB oracle restatement: each member exposes the SAME computation
  * twice — as a `Column` and as a SQL-text generator — built from one
  * shared constant table, so the two sides cannot drift (the
  * [[graft.ops.Dedup.portableCoeffs]] / `minhashCtes` discipline applied
  * to scalar arithmetic).
  *
  * Determinism rests on IEEE-754: +, -, *, /, sqrt are CORRECTLY ROUNDED
  * in every conforming engine, so a fixed-shape expression tree over
  * identical double inputs is bit-identical everywhere — what is NOT
  * portable is libm (log/exp/pow, 1-ulp-ish and implementation-defined),
  * which is why [[log2Micro]] is an explicit polynomial and not `log2`. */
object Portable {

  /** Least-squares coefficients for log2(1+u) on u ∈ [0,1), degree 9 with
    * no constant term (log2(1) = 0 exactly); |err| ≤ 1.75e-8 — below the
    * micro quantization step of [[log2Micro]]. */
  val Log2Coeffs: Seq[Double] = Seq(
    1.442693655091344, -0.7212951469131001, 0.4801732819903034,
    -0.35552064035293085, 0.26680843472526217, -0.18145030409863663,
    0.09679993445753729, -0.03375161495042578, 0.005542417540668115)

  /** floor-to-micro log2 of a POSITIVE integral column, as a BIGINT of
    * micro-log2 units: exponent from the binary length (no libm), mantissa
    * in [1,2) by an EXACT power-of-two division, fractional part by the
    * fixed Horner chain over [[Log2Coeffs]]. Identical bits in any
    * IEEE-754 engine, so sums of these integers are engine-exact. */
  def log2Micro(m: Column): Column = {
    val e = (length(bin(m)) - lit(1)).cast("int")
    // power-of-two divisor built by an integer shift (the DSL overload of
    // shiftleft only takes a literal count, so go through the SQL function)
    val u = m.cast("double") /
      call_function("shiftleft", lit(1L), e).cast("double") - lit(1.0)
    val poly = Log2Coeffs.reverse.tail
      .foldLeft(lit(Log2Coeffs.last): Column)((acc, c) => acc * u + lit(c)) * u
    round((e.cast("double") + poly) * lit(1e6)).cast("long")
  }

  /** [[log2Micro]] restated as DuckDB SQL over the expression text `m`
    * (referenced several times — pass a column name or cheap expression). */
  def sqlLog2Micro(m: String): String = {
    val e = s"(length(bin($m)) - 1)"
    val u = s"(CAST($m AS DOUBLE) / CAST((CAST(1 AS BIGINT) << $e) AS DOUBLE) - 1.0)"
    val poly = Log2Coeffs.reverse.tail
      .foldLeft(s"${Log2Coeffs.last}")((acc, c) => s"(($acc) * $u + $c)")
    s"CAST(round((CAST($e AS DOUBLE) + ($poly) * $u) * 1000000.0) AS BIGINT)"
  }

  /** Cumulative Poisson(1) thresholds scaled to 2³²: count k is assigned
    * when a 32-bit uniform hash falls below `PoissonThresholds32(k)` (and
    * none before), saturating at 8 (P ≈ 1e-5) — the standard one-pass
    * Poisson bootstrap draw, INTEGER-compared so no float parsing is
    * involved on either engine. */
  val PoissonThresholds32: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L, 4294923276L)

  /** Poisson(1) count from a 32-bit uniform hash column. */
  def poissonCount(hash32: Column): Column =
    PoissonThresholds32.zipWithIndex.foldRight(lit(PoissonThresholds32.size): Column) {
      case ((t, k), rest) => when(hash32 < lit(t), lit(k)).otherwise(rest)
    }.cast("long")

  /** [[poissonCount]] as DuckDB SQL over hash-expression text `h`. */
  def sqlPoissonCount(h: String): String =
    PoissonThresholds32.zipWithIndex.reverse.foldLeft(s"${PoissonThresholds32.size}") {
      case (rest, (t, k)) => s"CASE WHEN $h < $t THEN $k ELSE $rest END"
    }
}
