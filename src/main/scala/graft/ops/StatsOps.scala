package graft.ops

import graft.core.Exact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column statistics + normalization (SURVEY §2.4 A1-A3, hw0 parity).
  *
  * Reference: hw0/hw0_1.py:30-32 (tuple reduce min/max), hw0/hw0_2.py:
  * 42-62 (mean + population stdev), hw0/hw0_3.py:43-49 (min-max
  * normalize). All were RDD reduces; here a single declarative aggregate
  * does one pass with partial (map-side) + final hash aggregation.
  */
object StatsOps {

  /** One-pass min/max/count/mean/stddev_pop for a fixed-decimal column. */
  def colStats(df: DataFrame, c: String, scale: Int): DataFrame =
    df.agg(
      min(col(c)).as(s"min_$c"),
      max(col(c)).as(s"max_$c"),
      count(col(c)).as(s"count_$c"),
      Exact.avgFixed(col(c), scale).as(s"avg_$c"),
      Exact.stddevPopFixed(col(c), scale).as(s"stddev_pop_$c"))

  /** Min-max normalization of `c` to [0,1].
    *
    * Scale note: computed as a 1-row global aggregate cross-joined back
    * (Catalyst broadcasts the single row), NOT as `Window.partitionBy()`
    * over an empty partition — an empty-partition window funnels the
    * entire table through one task and dies at cluster scale.
    */
  def minMaxNormalize(df: DataFrame, c: String, out: String): DataFrame = {
    val bounds = df.agg(min(col(c)).as("__mn"), max(col(c)).as("__mx"))
    df.crossJoin(broadcast(bounds))
      .withColumn(out, (col(c) - col("__mn")) / (col("__mx") - col("__mn")))
      .drop("__mn", "__mx")
  }
}
