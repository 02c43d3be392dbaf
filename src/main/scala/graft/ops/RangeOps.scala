package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe interval (range) joins.
  *
  * A naive `p BETWEEN lo AND hi` join condition has no equality for
  * Spark to hash on, so the plan degenerates to a nested loop over
  * |intervals|×|points| — the same O(n²) cliff CartesianGuard rejects.
  * The standard fix (what a dedicated range-join optimizer does under
  * the hood) is binning: replicate each interval into the fixed-width
  * time bins it covers, put each point in its one bin, and equi-join
  * on (keys…, bin) before applying the exact range predicate. Work
  * becomes O(matches + intervals·bins-per-interval): linear, uniform
  * shuffle keys, AQE-splittable.
  */
object RangeOps {

  /** Inner interval join: rows of `intervals` (carrying `lo`/`hi`
    * LONG bound columns) matched to rows of `points` (carrying point
    * column `p`) with `lo <= p <= hi`, equi-keyed on `keys` +
    * `binWidth`-sized bins. Each (interval, point) pair matches at
    * most once — the point lives in exactly one bin — so no dedup
    * step is needed. Pick `binWidth` ≈ the typical interval length:
    * shorter bins replicate intervals more, longer bins grow the
    * per-bin candidate set. An interval spanning more than
    * `maxBinsPerInterval` bins fails the job loudly (per-row check)
    * rather than silently exploding the stage.
    */
  def intervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[String],
      lo: String,
      hi: String,
      p: String,
      binWidth: Long,
      maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    require(!intervals.columns.contains("__bin") &&
      !points.columns.contains("__bin"),
      "__bin is reserved by intervalJoin")
    val clash = (intervals.columns.toSet & points.columns.toSet) -- keys
    require(clash.isEmpty,
      s"non-key columns shared by both inputs would be ambiguous: $clash")
    // exact integer DIV on the named columns (double division would
    // round above 2^53 — ns-scale epochs live there). DIV truncates
    // toward zero rather than flooring, which is still correct:
    // trunc-div is monotone, so p ∈ [lo, hi] implies
    // p DIV w ∈ [lo DIV w, hi DIV w] and the bin range covers it.
    def bin(c: String): Column = expr(s"`$c` DIV $binWidth")
    // Replication cap: ONE corrupt million-bin interval row (a bad
    // epoch unit, a sentinel hi) would fan out into (hi-lo)/binWidth
    // replicas and silently dominate the stage — fail loudly instead.
    // The guard lives INSIDE the sequence bound (not a separate
    // assert_true column, which column pruning would drop as unused):
    // rows within the cap evaluate only the cheap comparison.
    val span = bin(hi) - bin(lo) + lit(1L)
    val hiGuarded = when(span <= lit(maxBinsPerInterval), bin(hi))
      .otherwise(raise_error(format_string(
        s"[graft] intervalJoin: interval [%s, %s] spans %s bins " +
          s"(> maxBinsPerInterval=$maxBinsPerInterval at " +
          s"binWidth=$binWidth) — raise binWidth or the cap, or " +
          "filter corrupt intervals upstream",
        col(lo), col(hi), span)).cast("long"))
    val binned = intervals
      // a corrupt hi < lo row would explode into a huge DESCENDING
      // bin sequence (sequence() steps -1 when start > stop); the
      // theta semantics for such a row are "no match" — drop it first
      .filter(col(lo) <= col(hi))
      .withColumn("__bin", explode(sequence(bin(lo), hiGuarded)))
    val pointBinned = points.withColumn("__bin", bin(p))
    binned
      .join(pointBinned, keys :+ "__bin")
      .filter(col(p) >= col(lo) && col(p) <= col(hi))
      .drop("__bin")
  }
}
