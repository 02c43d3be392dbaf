package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Order-independent ("exact") aggregate arithmetic over fixed-decimal
  * double columns.
  *
  * Why: naive `sum(double)` depends on addition order, which differs
  * between Spark's partial/final hash aggregation (parallel, partition-
  * order dependent) and a single-threaded oracle such as DuckDB. Errors of
  * ~n·eps·Σ|x| are enough to break hash-equality comparison of results.
  * At cluster scale the same property means results change run-to-run —
  * bad for regression testing.
  *
  * Fix: when the column is known to carry at most `scale` decimal digits
  * (money = 2, rates = 2, products of two 2-dp values = 4), lift each row
  * to an exact integer `round(x·10^scale)` (LONG), aggregate integers
  * (associative, exact, overflow-checked under ANSI mode), and convert to
  * double once at the end. Every operation is then deterministic and
  * bit-identical across engines and run topologies.
  *
  * Each helper has a paired `...Sql` builder producing the ANSI SQL mirror
  * with the *same expression structure* (same FP ops in the same order) so
  * the DuckDB oracle computes bit-identical doubles. Keep them in sync.
  *
  * Overflow bounds (ANSI mode errors instead of wrapping): |x|·10^scale
  * must stay < ~9.2e18 summed over all rows; for `stddevPop` the *square*
  * is summed, so keep |x|·10^scale ≲ 3e6 for ~1e6 rows.
  */
object Exact {
  private def p(scale: Int): Long = {
    require(scale >= 0 && scale <= 9, s"scale out of range: $scale")
    math.pow(10, scale).toLong
  }

  /** Lossless per-row fixed-point lift: round(x·10^scale) as LONG. */
  def fixed(c: Column, scale: Int): Column =
    round(c * lit(p(scale))).cast(LongType)

  def fixedSql(x: String, scale: Int): String =
    s"CAST(ROUND(($x)*${p(scale)}) AS BIGINT)"

  /** Exact sum of a fixed-decimal double column, returned as double. */
  def sumFixed(c: Column, scale: Int): Column =
    sum(fixed(c, scale)).cast(DoubleType) / lit(p(scale))

  def sumFixedSql(x: String, scale: Int): String =
    s"CAST(SUM(${fixedSql(x, scale)}) AS DOUBLE)/${p(scale)}"

  /** Exact mean (sum/count on the exact integer sum), as double. */
  def avgFixed(c: Column, scale: Int): Column =
    sum(fixed(c, scale)).cast(DoubleType) / lit(p(scale)) / count(c)

  def avgFixedSql(x: String, scale: Int): String =
    s"${sumFixedSql(x, scale)}/COUNT($x)"

  /** Exact population standard deviation via integer Σx, Σx².
    * Matches RDD `.stdev()` semantics (population, N divisor) — see
    * reference hw0/hw0_2.py:59-62 (SURVEY §2.4 A3).
    */
  def stddevPopFixed(c: Column, scale: Int): Column = {
    val f = fixed(c, scale)
    val s1 = sum(f).cast(DoubleType)
    val s2 = sum(f * f).cast(DoubleType)
    val n = count(c).cast(DoubleType)
    sqrt((s2 - s1 * s1 / n) / n) / lit(p(scale))
  }

  def stddevPopFixedSql(x: String, scale: Int): String = {
    val f = fixedSql(x, scale)
    val s1 = s"CAST(SUM($f) AS DOUBLE)"
    val s2 = s"CAST(SUM(($f)*($f)) AS DOUBLE)"
    val n = s"CAST(COUNT($x) AS DOUBLE)"
    s"SQRT(($s2 - $s1*$s1/$n)/$n)/${p(scale)}"
  }
}
